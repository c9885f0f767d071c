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
    """DenseNet block: each conv consumes the concat of all prior maps."""

    def __init__(self, ch, growth, layers):
        self.ws = [
            _cw(growth, ch + i * growth, 3) for i in range(layers)
        ]

    def __call__(self, x):
        feats = x
        for w in self.ws:
            h = jnp.maximum(_conv(feats, w), 0.0)
            feats = jnp.concatenate([feats, h], axis=1)
        return feats


def get_inputs():
    x = np.random.randn(8, 32, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 16, 4]
