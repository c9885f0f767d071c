import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """RMSNorm followed by a linear projection."""

    def __init__(self, dim, out):
        self.g = jnp.asarray(np.random.randn(dim).astype(np.float32))
        scale = 1.0 / np.sqrt(dim)
        self.w = jnp.asarray((np.random.randn(dim, out) * scale).astype(np.float32))

    def __call__(self, x):
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(ms + 1e-6) * self.g) @ self.w


def get_inputs():
    x = np.random.randn(1024, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [2048, 2048]
