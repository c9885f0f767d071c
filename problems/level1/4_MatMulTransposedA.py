import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Matrix multiplication with a transposed first operand: A.T @ B."""

    def __init__(self):
        pass

    def __call__(self, a, b):
        return a.T @ b


K, M, N = 2048, 1024, 1024


def get_inputs():
    a = np.random.randn(K, M).astype(np.float32)
    b = np.random.randn(K, N).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
