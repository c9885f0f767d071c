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
    """Two pre-norm causal transformer blocks."""

    def __init__(self, dim, heads, hidden):
        self.heads = heads
        self.blocks = []
        for _ in range(2):
            self.blocks.append(dict(
                g1=jnp.asarray(np.ones(dim, dtype=np.float32)),
                g2=jnp.asarray(np.ones(dim, dtype=np.float32)),
                wq=_mat(dim, dim), wk=_mat(dim, dim),
                wv=_mat(dim, dim), wo=_mat(dim, dim),
                w1=_mat(dim, hidden), w2=_mat(hidden, dim),
            ))

    def __call__(self, x):
        for blk in self.blocks:
            h = _rms(x, blk["g1"])
            x = x + _causal_mha(
                h, blk["wq"], blk["wk"], blk["wv"], blk["wo"], self.heads)
            h = _rms(x, blk["g2"])
            x = x + jax.nn.gelu(h @ blk["w1"], approximate=True) @ blk["w2"]
        return x


def get_inputs():
    x = np.random.randn(4, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8, 1024]
