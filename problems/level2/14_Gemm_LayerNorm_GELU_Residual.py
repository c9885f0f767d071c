import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Gemm followed by LayerNorm, GELU, Residual."""

    def __init__(self):
        scale = 1.0 / np.sqrt(1024)
        self.w = jnp.asarray(
            (np.random.randn(1024, 512) * scale).astype(np.float32))
        self.g0 = jnp.asarray(np.ones(512, dtype=np.float32))
        self.b0 = jnp.asarray(np.zeros(512, dtype=np.float32))

    def __call__(self, x):
        x = x @ self.w
        x0 = x
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * self.g0 + self.b0
        x = jax.nn.gelu(x, approximate=True)
        x = x + x0
        return x


def get_inputs():
    x = np.random.randn(256, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
