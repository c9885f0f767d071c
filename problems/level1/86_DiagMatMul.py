import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Diagonal matrix times dense matrix: diag(d) @ B."""

    def __init__(self):
        pass

    def __call__(self, d, b):
        return d[:, None] * b


def get_inputs():
    d = np.random.randn(2048).astype(np.float32)
    b = np.random.randn(2048, 2048).astype(np.float32)
    return [jnp.asarray(d), jnp.asarray(b)]


def get_init_inputs():
    return []
