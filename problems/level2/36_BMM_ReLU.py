import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """BMM followed by ReLU."""

    def __init__(self):
        scale = 1.0 / np.sqrt(256)
        self.w = jnp.asarray(
            (np.random.randn(16, 256, 128) * scale).astype(np.float32))

    def __call__(self, x):
        x = jnp.einsum("bij,bjk->bik", x, self.w)
        x = jnp.maximum(x, 0.0)
        return x


def get_inputs():
    x = np.random.randn(16, 128, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
