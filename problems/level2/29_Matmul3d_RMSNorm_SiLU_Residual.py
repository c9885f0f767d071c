import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Matmul3d followed by RMSNorm, SiLU, Residual."""

    def __init__(self):
        scale = 1.0 / np.sqrt(512)
        self.w = jnp.asarray(
            (np.random.randn(512, 512) * scale).astype(np.float32))
        self.g0 = jnp.asarray(np.ones(512, dtype=np.float32))

    def __call__(self, x):
        x = jnp.einsum("bsk,kn->bsn", x, self.w)
        x0 = x
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(ms + 1e-6) * self.g0
        x = x * jax.nn.sigmoid(x)
        x = x + x0
        return x


def get_inputs():
    x = np.random.randn(8, 256, 512).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
