import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Conv3d followed by BatchNorm, SiLU."""

    def __init__(self):
        scale = 1.0 / np.sqrt(8 * 27)
        self.w = jnp.asarray(
            (np.random.randn(16, 8, 3, 3, 3) * scale).astype(np.float32))
        self.bn_m0 = jnp.asarray(np.random.randn(16).astype(np.float32))
        self.bn_v0 = jnp.asarray((np.random.rand(16) + 0.5).astype(np.float32))

    def __call__(self, x):
        x = jax.lax.conv_general_dilated(
            x, self.w, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
        x = (x - self.bn_m0.reshape(1, 16, 1, 1, 1)) * jax.lax.rsqrt(self.bn_v0.reshape(1, 16, 1, 1, 1) + 1e-5)
        x = x * jax.nn.sigmoid(x)
        return x


def get_inputs():
    x = np.random.randn(4, 8, 8, 16, 16).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
