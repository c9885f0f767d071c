import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Mean hinge loss for +-1 labels."""

    def __init__(self):
        pass

    def __call__(self, pred, target):
        return jnp.mean(jnp.maximum(0.0, 1.0 - pred * target))


def get_inputs():
    pred = np.random.randn(65536).astype(np.float32)
    target = np.sign(np.random.randn(65536)).astype(np.float32)
    return [jnp.asarray(pred), jnp.asarray(target)]


def get_init_inputs():
    return []
