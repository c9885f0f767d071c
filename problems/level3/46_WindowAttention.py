import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Swin-style non-overlapping window self-attention."""

    def __init__(self, dim, window, heads):
        self.win = window
        self.h = heads
        self.hd = dim // heads
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))

    def __call__(self, x):
        b, s, d = x.shape
        w = self.win
        nw = s // w
        xw = x.reshape(b * nw, w, d)

        def split(t):
            return t.reshape(b * nw, w, self.h, self.hd).transpose(0, 2, 1, 3)

        q, k, v = split(xw @ self.wq), split(xw @ self.wk), split(xw @ self.wv)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        o = jax.nn.softmax(scores, axis=-1) @ v
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        return o @ self.wo


def get_inputs():
    x = np.random.randn(8, 1024, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 64, 8]
