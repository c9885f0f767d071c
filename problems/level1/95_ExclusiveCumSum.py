import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Exclusive prefix sum along the last dimension."""

    def __init__(self):
        pass

    def __call__(self, x):
        c = jnp.cumsum(x, axis=-1)
        return c - x


def get_inputs():
    x = np.random.randn(2048, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
