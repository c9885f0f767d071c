import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Layer normalization over the last dimension, learned scale/shift."""

    def __init__(self, dim):
        self.gamma = jnp.asarray(np.random.randn(dim).astype(np.float32))
        self.beta = jnp.asarray(np.random.randn(dim).astype(np.float32))

    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * self.gamma + self.beta


DIM = 4096


def get_inputs():
    x = np.random.randn(2048, DIM).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [DIM]
