import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Pre-norm transformer block: RMSNorm -> MHA -> RMSNorm -> SwiGLU."""

    def __init__(self, dim, n_heads, hidden):
        def mat(m, n):
            return jnp.asarray(
                (np.random.randn(m, n) / np.sqrt(m)).astype(np.float32)
            )

        self.dim, self.n_heads = dim, n_heads
        self.hd = dim // n_heads
        self.ln1 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.ln2 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.wq, self.wk, self.wv, self.wo = (
            mat(dim, dim), mat(dim, dim), mat(dim, dim), mat(dim, dim)
        )
        self.wg, self.wu, self.wd = mat(dim, hidden), mat(dim, hidden), mat(hidden, dim)

    def _rms(self, x, g):
        return x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-6
        ) * g

    def __call__(self, x):
        s, d = x.shape
        h = self._rms(x, self.ln1)
        q = (h @ self.wq).reshape(s, self.n_heads, self.hd).transpose(1, 0, 2)
        k = (h @ self.wk).reshape(s, self.n_heads, self.hd).transpose(1, 0, 2)
        v = (h @ self.wv).reshape(s, self.n_heads, self.hd).transpose(1, 0, 2)
        scores = q @ k.transpose(0, 2, 1) / jnp.sqrt(jnp.float32(self.hd))
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask[None], scores, -jnp.inf)
        attn = jax.nn.softmax(scores, axis=-1) @ v
        attn = attn.transpose(1, 0, 2).reshape(s, d)
        x = x + attn @ self.wo
        h = self._rms(x, self.ln2)
        g = h @ self.wg
        return x + ((g * jax.nn.sigmoid(g)) * (h @ self.wu)) @ self.wd


def get_inputs():
    x = np.random.randn(512, 512).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [512, 8, 1408]
