import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """ConvT2d followed by InstanceNorm, LeakyReLU, Scale."""

    def __init__(self):
        scale = 1.0 / np.sqrt(32 * 16)
        self.w = jnp.asarray(
            (np.random.randn(32, 16, 4, 4) * scale).astype(np.float32))

    def __call__(self, x):
        x = jax.lax.conv_transpose(
            x, self.w, strides=(2, 2), padding="SAME",
            dimension_numbers=("NCHW", "IOHW", "NCHW"))
        mean = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.var(x, axis=(2, 3), keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        x = jnp.where(x >= 0, x, 0.01 * x)
        x = x * 0.5
        return x


def get_inputs():
    x = np.random.randn(8, 32, 16, 16).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
