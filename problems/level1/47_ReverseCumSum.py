import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Cumulative sum running from the end backwards."""

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.flip(jnp.cumsum(jnp.flip(x, axis=-1), axis=-1), axis=-1)


def get_inputs():
    x = np.random.randn(2048, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
