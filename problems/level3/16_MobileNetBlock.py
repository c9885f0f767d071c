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
    """MobileNet depthwise-separable block with fixed-stat batch norms."""

    def __init__(self, ch, out):
        self.ch = ch
        self.dw = jnp.asarray(
            (np.random.randn(ch, 1, 3, 3) / 3.0).astype(np.float32))
        self.pw = _cw(out, ch, 1)
        self.m1 = jnp.asarray(np.random.randn(ch).astype(np.float32))
        self.v1 = jnp.asarray((np.random.rand(ch) + 0.5).astype(np.float32))
        self.m2 = jnp.asarray(np.random.randn(out).astype(np.float32))
        self.v2 = jnp.asarray((np.random.rand(out) + 0.5).astype(np.float32))

    def __call__(self, x):
        x = _conv(x, self.dw, groups=self.ch)
        x = (x - self.m1.reshape(1, -1, 1, 1)) * jax.lax.rsqrt(
            self.v1.reshape(1, -1, 1, 1) + 1e-5)
        x = jnp.maximum(x, 0.0)
        x = _conv(x, self.pw)
        x = (x - self.m2.reshape(1, -1, 1, 1)) * jax.lax.rsqrt(
            self.v2.reshape(1, -1, 1, 1) + 1e-5)
        return jnp.maximum(x, 0.0)


def get_inputs():
    x = np.random.randn(16, 32, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 64]
