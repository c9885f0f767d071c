import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Matrix-vector product."""

    def __init__(self):
        pass

    def __call__(self, a, x):
        return a @ x


M, K = 4096, 4096


def get_inputs():
    a = np.random.randn(M, K).astype(np.float32)
    x = np.random.randn(K).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(x)]


def get_init_inputs():
    return []
