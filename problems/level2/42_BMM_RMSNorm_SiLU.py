import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """BMM followed by RMSNorm, SiLU."""

    def __init__(self):
        scale = 1.0 / np.sqrt(256)
        self.w = jnp.asarray(
            (np.random.randn(16, 256, 128) * scale).astype(np.float32))
        self.g0 = jnp.asarray(np.ones(128, dtype=np.float32))

    def __call__(self, x):
        x = jnp.einsum("bij,bjk->bik", x, self.w)
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(ms + 1e-6) * self.g0
        x = x * jax.nn.sigmoid(x)
        return x


def get_inputs():
    x = np.random.randn(16, 128, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
