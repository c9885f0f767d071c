import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Tall outer-product-like matmul: large M/N, tiny K."""

    def __init__(self):
        pass

    def __call__(self, a, b):
        return a @ b


M, K, N = 4096, 16, 2048


def get_inputs():
    a = np.random.randn(M, K).astype(np.float32)
    b = np.random.randn(K, N).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
