import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """GRU cell applied once."""

    def __init__(self, inp, hidden):
        self.wx = _mat(inp, 3 * hidden)
        self.wh = _mat(hidden, 3 * hidden)

    def __call__(self, x, h):
        zx = x @ self.wx
        zh = h @ self.wh
        xr, xz, xn = jnp.split(zx, 3, axis=-1)
        hr, hz, hn = jnp.split(zh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h


def get_inputs():
    x = np.random.randn(512, 512).astype(np.float32)
    h = np.random.randn(512, 768).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(h)]


def get_init_inputs():
    return [512, 768]
