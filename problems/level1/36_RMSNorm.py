import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Root-mean-square normalization with learned scale."""

    def __init__(self, dim):
        self.weight = jnp.asarray(np.random.randn(dim).astype(np.float32))

    def __call__(self, x):
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + 1e-6) * self.weight


DIM = 4096


def get_inputs():
    x = np.random.randn(2048, DIM).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [DIM]
