import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Conv2d followed by GroupNorm, SiLU."""

    def __init__(self):
        scale = 1.0 / np.sqrt(16 * 9)
        self.w = jnp.asarray(
            (np.random.randn(32, 16, 3, 3) * scale).astype(np.float32))

    def __call__(self, x):
        x = jax.lax.conv_general_dilated(
            x, self.w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        n, c, h, w = x.shape
        xg = x.reshape(n, 8, c // 8, h, w)
        mean = jnp.mean(xg, axis=(2, 3, 4), keepdims=True)
        var = jnp.var(xg, axis=(2, 3, 4), keepdims=True)
        x = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(n, c, h, w)
        x = x * jax.nn.sigmoid(x)
        return x


def get_inputs():
    x = np.random.randn(8, 16, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
