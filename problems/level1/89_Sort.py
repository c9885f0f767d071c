import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Row-wise ascending sort."""

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.sort(x, axis=-1)


def get_inputs():
    x = np.random.randn(1024, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
