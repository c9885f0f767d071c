import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Conv1d followed by BiasAdd, ELU, GlobalAvgPool."""

    def __init__(self):
        scale = 1.0 / np.sqrt(32 * 5)
        self.w = jnp.asarray(
            (np.random.randn(64, 32, 5) * scale).astype(np.float32))
        self.bias0 = jnp.asarray(np.random.randn(64).astype(np.float32))

    def __call__(self, x):
        x = jax.lax.conv_general_dilated(
            x, self.w, (1,), "SAME",
            dimension_numbers=("NCH", "OIH", "NCH"))
        x = x + self.bias0.reshape(1, 64, 1)
        x = jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)
        x = jnp.mean(x, axis=(2,))
        return x


def get_inputs():
    x = np.random.randn(16, 32, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
