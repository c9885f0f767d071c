import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Linear attention: phi(q) (phi(k)^T v) with elu+1 feature map."""

    def __init__(self, dim, heads):
        self.h = heads
        self.hd = dim // heads
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))

    def __call__(self, x):
        b, s, d = x.shape

        def split(t):
            return t.reshape(b, s, self.h, self.hd).transpose(0, 2, 1, 3)

        def phi(t):
            return jnp.where(t > 0, t + 1.0,
                             jnp.exp(jnp.minimum(t, 0.0)))

        q = phi(split(x @ self.wq))
        k = phi(split(x @ self.wk))
        v = split(x @ self.wv)
        kv = jnp.einsum("bhsk,bhsv->bhkv", k, v)
        z = 1.0 / (jnp.einsum("bhsk,bhk->bhs", q, jnp.sum(k, axis=2)) + 1e-6)
        o = jnp.einsum("bhsk,bhkv->bhsv", q, kv) * z[..., None]
        return o.transpose(0, 2, 1, 3).reshape(b, s, d) @ self.wo


def get_inputs():
    x = np.random.randn(8, 1024, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 8]
