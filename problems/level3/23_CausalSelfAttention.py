import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Causally-masked multi-head self-attention."""

    def __init__(self, dim, heads):
        self.h = heads
        self.hd = dim // heads
        self.wqkv = _mat(dim, 3 * dim)
        self.wo = _mat(dim, dim)

    def __call__(self, x):
        b, s, d = x.shape
        qkv = x @ self.wqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, s, self.h, self.hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
        o = jax.nn.softmax(scores, axis=-1) @ v
        return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ self.wo


def get_inputs():
    x = np.random.randn(8, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8]
