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
    """Two-scale U-Net: down conv+pool, bottleneck, upsample + skip."""

    def __init__(self):
        self.d1 = _cw(16, 3, 3)
        self.d2 = _cw(32, 16, 3)
        self.up = _cw(16, 32, 3)
        self.out = _cw(8, 32, 3)

    def __call__(self, x):
        e1 = jnp.maximum(_conv(x, self.d1), 0.0)
        e2 = jnp.maximum(_conv(_maxpool(e1), self.d2), 0.0)
        u = jnp.repeat(jnp.repeat(e2, 2, axis=2), 2, axis=3)
        u = jnp.maximum(_conv(u, self.up), 0.0)
        cat = jnp.concatenate([u, e1], axis=1)
        return _conv(cat, self.out)


def get_inputs():
    x = np.random.randn(8, 3, 64, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
