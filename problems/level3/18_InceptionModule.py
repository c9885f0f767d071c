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
    """Inception-style module: parallel 1x1 / 3x3 / 5x5 / pool branches."""

    def __init__(self, ch):
        self.b1 = _cw(16, ch, 1)
        self.b3r = _cw(24, ch, 1)
        self.b3 = _cw(32, 24, 3)
        self.b5r = _cw(8, ch, 1)
        self.b5 = _cw(16, 8, 5)
        self.bp = _cw(16, ch, 1)

    def __call__(self, x):
        r1 = jnp.maximum(_conv(x, self.b1), 0.0)
        r3 = jnp.maximum(_conv(jnp.maximum(_conv(x, self.b3r), 0.0), self.b3), 0.0)
        r5 = jnp.maximum(_conv(jnp.maximum(_conv(x, self.b5r), 0.0), self.b5), 0.0)
        p = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 1, 1), "SAME")
        rp = jnp.maximum(_conv(p, self.bp), 0.0)
        return jnp.concatenate([r1, r3, r5, rp], axis=1)


def get_inputs():
    x = np.random.randn(16, 64, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64]
