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
    """MobileNetV2 inverted residual: 1x1 expand, depthwise, 1x1 project."""

    def __init__(self, ch, expand):
        self.mid = ch * expand
        self.we = _cw(self.mid, ch, 1)
        self.dw = jnp.asarray(
            (np.random.randn(self.mid, 1, 3, 3) / 3.0).astype(np.float32))
        self.wp = _cw(ch, self.mid, 1)

    def __call__(self, x):
        h = jnp.clip(_conv(x, self.we), 0.0, 6.0)
        h = jnp.clip(_conv(h, self.dw, groups=self.mid), 0.0, 6.0)
        return x + _conv(h, self.wp)


def get_inputs():
    x = np.random.randn(16, 32, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 4]
