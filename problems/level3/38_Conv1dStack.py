import numpy as np
import jax
import jax.numpy as jnp

def _conv1d(x, w, dilation=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (1,), padding, rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"))


def _c1w(o, i, k):
    return jnp.asarray(
        (np.random.randn(o, i, k) / np.sqrt(i * k)).astype(np.float32))


class Model:
    """Stack of widening conv1d + pool stages with a linear head."""

    def __init__(self):
        self.w1 = _c1w(32, 8, 5)
        self.w2 = _c1w(64, 32, 5)
        self.w3 = _c1w(128, 64, 3)
        self.head = jnp.asarray(
            (np.random.randn(128, 10) / np.sqrt(128)).astype(np.float32))

    def _pool(self, x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 4), (1, 1, 4), "VALID")

    def __call__(self, x):
        x = self._pool(jnp.maximum(_conv1d(x, self.w1), 0.0))
        x = self._pool(jnp.maximum(_conv1d(x, self.w2), 0.0))
        x = jnp.maximum(_conv1d(x, self.w3), 0.0)
        return jnp.mean(x, axis=-1) @ self.head


def get_inputs():
    x = np.random.randn(32, 8, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
