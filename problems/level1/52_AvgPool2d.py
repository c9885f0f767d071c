import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """2x2 average pooling, stride 2 (NCHW)."""

    def __init__(self):
        pass

    def __call__(self, x):
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )
        return s / 4.0


def get_inputs():
    x = np.random.randn(16, 32, 128, 128).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
