import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """2D transpose."""

    def __init__(self):
        pass

    def __call__(self, x):
        return x.T


def get_inputs():
    x = np.random.randn(2048, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
