import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Conv2d followed by BiasAdd, ReLU, MaxPool."""

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
        x = jnp.maximum(x, 0.0)
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        return x


def get_inputs():
    x = np.random.randn(8, 16, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
