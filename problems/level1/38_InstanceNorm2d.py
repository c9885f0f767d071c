import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Instance normalization over spatial dims (NCHW)."""

    def __init__(self, ch):
        self.gamma = jnp.asarray(np.random.rand(ch).astype(np.float32) + 0.5)
        self.beta = jnp.asarray(np.random.randn(ch).astype(np.float32))

    def __call__(self, x):
        mean = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.var(x, axis=(2, 3), keepdims=True)
        c = x.shape[1]
        return (
            (x - mean) * jax.lax.rsqrt(var + 1e-5)
            * self.gamma.reshape(1, c, 1, 1)
            + self.beta.reshape(1, c, 1, 1)
        )


def get_inputs():
    x = np.random.randn(16, 64, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64]
