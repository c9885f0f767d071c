import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Conv3d followed by BiasAdd, ReLU."""

    def __init__(self):
        scale = 1.0 / np.sqrt(8 * 27)
        self.w = jnp.asarray(
            (np.random.randn(16, 8, 3, 3, 3) * scale).astype(np.float32))
        self.bias0 = jnp.asarray(np.random.randn(16).astype(np.float32))

    def __call__(self, x):
        x = jax.lax.conv_general_dilated(
            x, self.w, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
        x = x + self.bias0.reshape(1, 16, 1, 1, 1)
        x = jnp.maximum(x, 0.0)
        return x


def get_inputs():
    x = np.random.randn(4, 8, 8, 16, 16).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
