import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Gemm followed by Scale, Residual, ReLU."""

    def __init__(self):
        scale = 1.0 / np.sqrt(1024)
        self.w = jnp.asarray(
            (np.random.randn(1024, 512) * scale).astype(np.float32))

    def __call__(self, x):
        x = x @ self.w
        x0 = x
        x = x * 0.5
        x = x + x0
        x = jnp.maximum(x, 0.0)
        return x


def get_inputs():
    x = np.random.randn(256, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
