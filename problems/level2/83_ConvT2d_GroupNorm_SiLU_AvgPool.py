import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """ConvT2d followed by GroupNorm, SiLU, AvgPool."""

    def __init__(self):
        scale = 1.0 / np.sqrt(32 * 16)
        self.w = jnp.asarray(
            (np.random.randn(32, 16, 4, 4) * scale).astype(np.float32))

    def __call__(self, x):
        x = jax.lax.conv_transpose(
            x, self.w, strides=(2, 2), padding="SAME",
            dimension_numbers=("NCHW", "IOHW", "NCHW"))
        n, c, h, w = x.shape
        xg = x.reshape(n, 8, c // 8, h, w)
        mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
        var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
        x = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(n, c, h, w)
        x = x * jax.nn.sigmoid(x)
        x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID") / 4.0
        return x


def get_inputs():
    x = np.random.randn(8, 32, 16, 16).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
