import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Cumulative sum of masked elements (mask zeroes excluded)."""

    def __init__(self):
        pass

    def __call__(self, x, mask):
        return jnp.cumsum(jnp.where(mask, x, 0.0), axis=-1)


def get_inputs():
    x = np.random.randn(2048, 4096).astype(np.float32)
    mask = (np.random.rand(2048, 4096) > 0.5)
    return [jnp.asarray(x), jnp.asarray(mask)]


def get_init_inputs():
    return []
