import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Learned-query attention pooling over a sequence."""

    def __init__(self, dim):
        self.query = jnp.asarray((np.random.randn(1, dim) * 0.1).astype(np.float32))
        self.wk = _mat(dim, dim)
        self.wv = _mat(dim, dim)
        self.dim = dim

    def __call__(self, x):
        k = x @ self.wk
        v = x @ self.wv
        scores = self.query @ k.transpose(0, 2, 1)[...] / jnp.sqrt(
            jnp.float32(self.dim))
        w = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bqs,bsd->bqd", w, v)[:, 0]


def get_inputs():
    x = np.random.randn(16, 512, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256]
