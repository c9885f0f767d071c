import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Group normalization (NCHW, groups of channels)."""

    def __init__(self, ch, groups):
        self.groups = groups
        self.gamma = jnp.asarray(np.random.rand(ch).astype(np.float32) + 0.5)
        self.beta = jnp.asarray(np.random.randn(ch).astype(np.float32))

    def __call__(self, x):
        n, c, h, w = x.shape
        g = self.groups
        xg = x.reshape(n, g, c // g, h, w)
        mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
        var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
        xn = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(n, c, h, w)
        return xn * self.gamma.reshape(1, c, 1, 1) + self.beta.reshape(1, c, 1, 1)


def get_inputs():
    x = np.random.randn(16, 64, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64, 8]
