import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Matrix multiplication at odd, non-power-of-two shapes."""

    def __init__(self):
        pass

    def __call__(self, a, b):
        return a @ b


M, K, N = 1000, 1791, 1227


def get_inputs():
    a = np.random.randn(M, K).astype(np.float32)
    b = np.random.randn(K, N).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
