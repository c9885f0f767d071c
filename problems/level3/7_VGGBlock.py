import numpy as np
import jax
import jax.numpy as jnp

def _conv(x, w, stride=1, padding="SAME", groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding, feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


def _cw(o, i, k):
    return jnp.asarray(
        (np.random.randn(o, i, k, k) / np.sqrt(i * k * k)).astype(np.float32))


class Model:
    """VGG-style double-conv block with pooling and a linear head."""

    def __init__(self):
        self.w1 = _cw(32, 3, 3)
        self.w2 = _cw(32, 32, 3)
        self.w3 = _cw(64, 32, 3)
        self.w4 = _cw(64, 64, 3)
        self.head = _mat(64 * 8 * 8, 10)

    def __call__(self, x):
        x = jnp.maximum(_conv(x, self.w1), 0.0)
        x = _maxpool(jnp.maximum(_conv(x, self.w2), 0.0))
        x = jnp.maximum(_conv(x, self.w3), 0.0)
        x = _maxpool(jnp.maximum(_conv(x, self.w4), 0.0))
        return x.reshape(x.shape[0], -1) @ self.head


def get_inputs():
    x = np.random.randn(32, 3, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
