import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Small conv net: two conv+relu+pool stages and a linear head."""

    def __init__(self):
        def conv_w(o, i, k):
            scale = 1.0 / np.sqrt(i * k * k)
            return jnp.asarray((np.random.randn(o, i, k, k) * scale).astype(np.float32))

        self.w1 = conv_w(16, 3, 3)
        self.w2 = conv_w(32, 16, 3)
        self.head = jnp.asarray(
            (np.random.randn(32 * 6 * 6, 10) * 0.03).astype(np.float32)
        )

    def _stage(self, x, w):
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
        x = jnp.maximum(x, 0.0)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )

    def __call__(self, x):
        x = self._stage(x, self.w1)
        x = self._stage(x, self.w2)
        return x.reshape(x.shape[0], -1) @ self.head


def get_inputs():
    x = np.random.randn(32, 3, 30, 30).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
