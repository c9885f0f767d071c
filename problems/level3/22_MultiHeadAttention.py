import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Batched multi-head self-attention (bidirectional)."""

    def __init__(self, dim, heads):
        self.h = heads
        self.hd = dim // heads
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))

    def __call__(self, x):
        b, s, d = x.shape

        def split(t):
            return t.reshape(b, s, self.h, self.hd).transpose(0, 2, 1, 3)

        q, k, v = split(x @ self.wq), split(x @ self.wk), split(x @ self.wv)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        o = jax.nn.softmax(scores, axis=-1) @ v
        return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ self.wo


def get_inputs():
    x = np.random.randn(8, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8]
