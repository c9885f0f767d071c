import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


def _causal_mha(x, wq, wk, wv, wo, heads):
    b, s, d = x.shape
    hd = d // heads

    def split(t):
        return t.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(x @ wq), split(x @ wk), split(x @ wv)
    scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(hd))
    mask = jnp.tril(jnp.ones((s, s), dtype=bool))
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    o = jax.nn.softmax(scores, axis=-1) @ v
    return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ wo


def _rms(x, g):
    return x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-6) * g


class Model:
    """Tiny LM: embedding, one causal block, tied-embedding logits."""

    def __init__(self, vocab, dim, heads, hidden):
        self.heads = heads
        self.table = jnp.asarray(
            (np.random.randn(vocab, dim) * 0.02).astype(np.float32))
        self.g1 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.g2 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.gf = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.wq, self.wk = _mat(dim, dim), _mat(dim, dim)
        self.wv, self.wo = _mat(dim, dim), _mat(dim, dim)
        self.w1, self.w2 = _mat(dim, hidden), _mat(hidden, dim)

    def __call__(self, ids):
        x = self.table[ids]
        h = _rms(x, self.g1)
        x = x + _causal_mha(
            h, self.wq, self.wk, self.wv, self.wo, self.heads)
        h = _rms(x, self.g2)
        x = x + jax.nn.gelu(h @ self.w1, approximate=True) @ self.w2
        return _rms(x, self.gf) @ self.table.T


def get_inputs():
    ids = np.random.randint(0, 2048, size=(4, 256))
    return [jnp.asarray(ids)]


def get_init_inputs():
    return [2048, 256, 8, 1024]
