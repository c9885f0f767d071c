import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Smooth L1 (beta = 1): quadratic near zero, linear in the tails."""

    def __init__(self):
        pass

    def __call__(self, pred, target):
        d = jnp.abs(pred - target)
        return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def get_inputs():
    pred = np.random.randn(4096, 1024).astype(np.float32)
    target = np.random.randn(4096, 1024).astype(np.float32)
    return [jnp.asarray(pred), jnp.asarray(target)]


def get_init_inputs():
    return []
