import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Lower-triangular matrix times a dense matrix."""

    def __init__(self):
        pass

    def __call__(self, a, b):
        return jnp.tril(a) @ b


def get_inputs():
    a = np.random.randn(1024, 1024).astype(np.float32)
    b = np.random.randn(1024, 1024).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
