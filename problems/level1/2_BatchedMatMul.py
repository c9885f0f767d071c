import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Batched matrix multiplication over a leading batch dimension."""

    def __init__(self):
        pass

    def __call__(self, a, b):
        return jnp.einsum("bij,bjk->bik", a, b)


B, M, K, N = 16, 256, 512, 256


def get_inputs():
    a = np.random.randn(B, M, K).astype(np.float32)
    b = np.random.randn(B, K, N).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
