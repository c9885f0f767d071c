import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """BMM followed by Scale, Tanh."""

    def __init__(self):
        scale = 1.0 / np.sqrt(256)
        self.w = jnp.asarray(
            (np.random.randn(16, 256, 128) * scale).astype(np.float32))

    def __call__(self, x):
        x = jnp.einsum("bij,bjk->bik", x, self.w)
        x = x * 0.5
        x = jnp.tanh(x)
        return x


def get_inputs():
    x = np.random.randn(16, 128, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
