import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """ConvT2d followed by BiasAdd, Tanh, GlobalAvgPool."""

    def __init__(self):
        scale = 1.0 / np.sqrt(32 * 16)
        self.w = jnp.asarray(
            (np.random.randn(32, 16, 4, 4) * scale).astype(np.float32))
        self.bias0 = jnp.asarray(np.random.randn(16).astype(np.float32))

    def __call__(self, x):
        x = jax.lax.conv_transpose(
            x, self.w, strides=(2, 2), padding="SAME",
            dimension_numbers=("NCHW", "IOHW", "NCHW"))
        x = x + self.bias0.reshape(1, 16, 1, 1)
        x = jnp.tanh(x)
        x = jnp.mean(x, axis=(2, 3))
        return x


def get_inputs():
    x = np.random.randn(8, 32, 16, 16).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
