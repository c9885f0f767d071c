import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Gemm followed by BiasAdd, ReLU, RMSNorm, Residual."""

    def __init__(self):
        scale = 1.0 / np.sqrt(1024)
        self.w = jnp.asarray(
            (np.random.randn(1024, 512) * scale).astype(np.float32))
        self.bias0 = jnp.asarray(np.random.randn(512).astype(np.float32))
        self.g1 = jnp.asarray(np.ones(512, dtype=np.float32))

    def __call__(self, x):
        x = x @ self.w
        x0 = x
        x = x + self.bias0
        x = jnp.maximum(x, 0.0)
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(ms + 1e-6) * self.g1
        x = x + x0
        return x


def get_inputs():
    x = np.random.randn(256, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
