import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Grouped-query attention: 8 query heads share 2 KV heads."""

    def __init__(self, dim, heads, kv_heads):
        self.h, self.kv = heads, kv_heads
        self.hd = dim // heads
        self.wq = _mat(dim, dim)
        self.wk = _mat(dim, self.kv * self.hd)
        self.wv = _mat(dim, self.kv * self.hd)
        self.wo = _mat(dim, dim)

    def __call__(self, x):
        b, s, d = x.shape
        g = self.h // self.kv
        q = (x @ self.wq).reshape(b, s, self.kv, g, self.hd)
        k = (x @ self.wk).reshape(b, s, self.kv, self.hd)
        v = (x @ self.wv).reshape(b, s, self.kv, self.hd)
        scores = jnp.einsum("bskgh,btkh->bkgst", q, k) / jnp.sqrt(
            jnp.float32(self.hd))
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bkgst,btkh->bskgh", p, v).reshape(b, s, d)
        return o @ self.wo


def get_inputs():
    x = np.random.randn(8, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8, 2]
