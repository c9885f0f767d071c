import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Gather rows of a matrix by index."""

    def __init__(self):
        pass

    def __call__(self, x, idx):
        return x[idx]


def get_inputs():
    x = np.random.randn(8192, 512).astype(np.float32)
    idx = np.random.randint(0, 8192, size=(4096,))
    return [jnp.asarray(x), jnp.asarray(idx)]


def get_init_inputs():
    return []
