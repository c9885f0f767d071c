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
    """Stem conv + three residual blocks + pooled linear head."""

    def __init__(self):
        self.stem = _cw(32, 3, 3)
        self.blocks = [(_cw(32, 32, 3), _cw(32, 32, 3)) for _ in range(3)]
        self.head = _mat(32, 10)

    def __call__(self, x):
        x = jnp.maximum(_conv(x, self.stem), 0.0)
        for w1, w2 in self.blocks:
            h = jnp.maximum(_conv(x, w1), 0.0)
            h = _conv(h, w2)
            x = jnp.maximum(x + h, 0.0)
        return jnp.mean(x, axis=(2, 3)) @ self.head


def get_inputs():
    x = np.random.randn(16, 3, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
