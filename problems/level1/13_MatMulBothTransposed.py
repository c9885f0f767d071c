import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Matrix multiplication with both operands transposed: A.T @ B.T."""

    def __init__(self):
        pass

    def __call__(self, a, b):
        return a.T @ b.T


M, K, N = 1024, 1024, 1024


def get_inputs():
    a = np.random.randn(K, M).astype(np.float32)
    b = np.random.randn(N, K).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
