import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Cross-attention: queries from x, keys/values from a context."""

    def __init__(self, dim, heads):
        self.h = heads
        self.hd = dim // heads
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))

    def __call__(self, x, ctx):
        b, s, d = x.shape
        t = ctx.shape[1]

        def split(v, n):
            return v.reshape(b, n, self.h, self.hd).transpose(0, 2, 1, 3)

        q = split(x @ self.wq, s)
        k = split(ctx @ self.wk, t)
        v = split(ctx @ self.wv, t)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        o = jax.nn.softmax(scores, axis=-1) @ v
        return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ self.wo


def get_inputs():
    x = np.random.randn(8, 128, 256).astype(np.float32)
    ctx = np.random.randn(8, 512, 256).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(ctx)]


def get_init_inputs():
    return [256, 8]
