import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Post-norm transformer encoder layer (MHA + FFN, layer norms)."""

    def __init__(self, dim, heads, hidden):
        self.h, self.hd = heads, dim // heads
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))
        self.w1, self.w2 = _mat(dim, hidden), _mat(hidden, dim)
        self.g1 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.g2 = jnp.asarray(np.ones(dim, dtype=np.float32))

    def _ln(self, x, g):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * g

    def __call__(self, x):
        b, s, d = x.shape

        def split(t):
            return t.reshape(b, s, self.h, self.hd).transpose(0, 2, 1, 3)

        q, k, v = split(x @ self.wq), split(x @ self.wk), split(x @ self.wv)
        scores = q @ k.transpose(0, 1, 3, 2) / jnp.sqrt(jnp.float32(self.hd))
        o = jax.nn.softmax(scores, axis=-1) @ v
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d) @ self.wo
        x = self._ln(x + o, self.g1)
        h = jnp.maximum(x @ self.w1, 0.0) @ self.w2
        return self._ln(x + h, self.g2)


def get_inputs():
    x = np.random.randn(8, 256, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8, 1024]
