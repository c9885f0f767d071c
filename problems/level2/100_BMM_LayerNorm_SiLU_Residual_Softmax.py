import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """BMM followed by LayerNorm, SiLU, Residual, Softmax."""

    def __init__(self):
        scale = 1.0 / np.sqrt(256)
        self.w = jnp.asarray(
            (np.random.randn(16, 256, 128) * scale).astype(np.float32))
        self.g0 = jnp.asarray(np.ones(128, dtype=np.float32))
        self.b0 = jnp.asarray(np.zeros(128, dtype=np.float32))

    def __call__(self, x):
        x = jnp.einsum("bij,bjk->bik", x, self.w)
        x0 = x
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * self.g0 + self.b0
        x = x * jax.nn.sigmoid(x)
        x = x + x0
        x = jax.nn.softmax(x, axis=-1)
        return x


def get_inputs():
    x = np.random.randn(16, 128, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
