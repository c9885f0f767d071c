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
    """LeNet-style conv net: two conv+pool stages, two linear layers."""

    def __init__(self):
        self.w1 = _cw(6, 1, 5)
        self.w2 = _cw(16, 6, 5)
        self.f1 = _mat(16 * 8 * 8, 120)
        self.f2 = _mat(120, 10)

    def __call__(self, x):
        x = _maxpool(jnp.tanh(_conv(x, self.w1)))
        x = _maxpool(jnp.tanh(_conv(x, self.w2)))
        x = x.reshape(x.shape[0], -1)
        return jnp.tanh(x @ self.f1) @ self.f2


def get_inputs():
    x = np.random.randn(64, 1, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
