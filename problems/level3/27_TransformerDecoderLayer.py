import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Transformer decoder layer: causal self-attn + cross-attn + FFN."""

    def __init__(self, dim, heads, hidden):
        self.h, self.hd = heads, dim // heads
        self.sq, self.sk, self.sv, self.so = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))
        self.cq, self.ck, self.cv, self.co = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))
        self.w1, self.w2 = _mat(dim, hidden), _mat(hidden, dim)

    def _mha(self, q, k, v, causal):
        b, s, d = q.shape
        t = k.shape[1]

        def split(x, n):
            return x.reshape(b, n, self.h, self.hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q, s), split(k, t), split(v, t)
        scores = qh @ kh.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        if causal:
            mask = jnp.tril(jnp.ones((s, t), dtype=bool))
            scores = jnp.where(mask[None, None], scores, -jnp.inf)
        o = jax.nn.softmax(scores, axis=-1) @ vh
        return o.transpose(0, 2, 1, 3).reshape(b, s, d)

    def __call__(self, x, memory):
        x = x + self._mha(x @ self.sq, x @ self.sk, x @ self.sv, True) @ self.so
        x = x + self._mha(
            x @ self.cq, memory @ self.ck, memory @ self.cv, False) @ self.co
        return x + jnp.maximum(x @ self.w1, 0.0) @ self.w2


def get_inputs():
    x = np.random.randn(4, 128, 256).astype(np.float32)
    mem = np.random.randn(4, 256, 256).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(mem)]


def get_init_inputs():
    return [256, 8, 1024]
