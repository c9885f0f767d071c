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
    """SqueezeNet fire module: 1x1 squeeze, parallel 1x1/3x3 expand."""

    def __init__(self, ch, squeeze, expand):
        self.ws = _cw(squeeze, ch, 1)
        self.we1 = _cw(expand, squeeze, 1)
        self.we3 = _cw(expand, squeeze, 3)

    def __call__(self, x):
        s = jnp.maximum(_conv(x, self.ws), 0.0)
        e1 = jnp.maximum(_conv(s, self.we1), 0.0)
        e3 = jnp.maximum(_conv(s, self.we3), 0.0)
        return jnp.concatenate([e1, e3], axis=1)


def get_inputs():
    x = np.random.randn(16, 96, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [96, 16, 64]
