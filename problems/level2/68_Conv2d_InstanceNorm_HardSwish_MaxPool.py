import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Conv2d followed by InstanceNorm, HardSwish, MaxPool."""

    def __init__(self):
        scale = 1.0 / np.sqrt(16 * 9)
        self.w = jnp.asarray(
            (np.random.randn(32, 16, 3, 3) * scale).astype(np.float32))

    def __call__(self, x):
        x = jax.lax.conv_general_dilated(
            x, self.w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        mean = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.var(x, axis=(2, 3), keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        x = x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        return x


def get_inputs():
    x = np.random.randn(8, 16, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
