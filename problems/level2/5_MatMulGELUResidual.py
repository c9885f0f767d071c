import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Linear + GELU + residual connection."""

    def __init__(self, dim):
        scale = 1.0 / np.sqrt(dim)
        self.w = jnp.asarray((np.random.randn(dim, dim) * scale).astype(np.float32))

    def __call__(self, x):
        return x + jax.nn.gelu(x @ self.w, approximate=True)


def get_inputs():
    x = np.random.randn(1024, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [2048]
