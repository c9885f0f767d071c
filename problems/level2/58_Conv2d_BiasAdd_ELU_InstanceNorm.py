import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Conv2d followed by BiasAdd, ELU, InstanceNorm."""

    def __init__(self):
        scale = 1.0 / np.sqrt(16 * 9)
        self.w = jnp.asarray(
            (np.random.randn(32, 16, 3, 3) * scale).astype(np.float32))
        self.bias0 = jnp.asarray(np.random.randn(32).astype(np.float32))

    def __call__(self, x):
        x = jax.lax.conv_general_dilated(
            x, self.w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + self.bias0.reshape(1, 32, 1, 1)
        x = jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)
        mean = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.var(x, axis=(2, 3), keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return x


def get_inputs():
    x = np.random.randn(8, 16, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
