import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Batch normalization at inference: fixed statistics (NCHW)."""

    def __init__(self, ch):
        self.gamma = jnp.asarray(np.random.rand(ch).astype(np.float32) + 0.5)
        self.beta = jnp.asarray(np.random.randn(ch).astype(np.float32))
        self.mean = jnp.asarray(np.random.randn(ch).astype(np.float32))
        self.var = jnp.asarray(np.random.rand(ch).astype(np.float32) + 0.5)

    def __call__(self, x):
        c = x.shape[1]
        shape = (1, c, 1, 1)
        return (
            (x - self.mean.reshape(shape))
            * jax.lax.rsqrt(self.var.reshape(shape) + 1e-5)
            * self.gamma.reshape(shape)
            + self.beta.reshape(shape)
        )


def get_inputs():
    x = np.random.randn(16, 64, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64]
