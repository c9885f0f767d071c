import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Zero-pad a 2D array by 16 on each side."""

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.pad(x, ((16, 16), (16, 16)))


def get_inputs():
    x = np.random.randn(2048, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
