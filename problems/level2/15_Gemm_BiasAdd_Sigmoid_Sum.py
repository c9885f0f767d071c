import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Gemm followed by BiasAdd, Sigmoid, Sum."""

    def __init__(self):
        scale = 1.0 / np.sqrt(1024)
        self.w = jnp.asarray(
            (np.random.randn(1024, 512) * scale).astype(np.float32))
        self.bias0 = jnp.asarray(np.random.randn(512).astype(np.float32))

    def __call__(self, x):
        x = x @ self.w
        x = x + self.bias0
        x = jax.nn.sigmoid(x)
        x = jnp.sum(x, axis=-1)
        return x


def get_inputs():
    x = np.random.randn(256, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
