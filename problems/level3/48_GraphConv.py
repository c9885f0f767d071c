import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Two-layer graph convolution: A_norm @ X @ W with ReLU."""

    def __init__(self, dim, hidden, classes):
        self.w1 = _mat(dim, hidden)
        self.w2 = _mat(hidden, classes)

    def __call__(self, adj, x):
        deg = jnp.sum(adj, axis=-1)
        dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-6))
        a = adj * dinv[:, None] * dinv[None, :]
        h = jnp.maximum(a @ (x @ self.w1), 0.0)
        return a @ (h @ self.w2)


def get_inputs():
    adj = (np.random.rand(1024, 1024) < 0.01).astype(np.float32)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 1.0)
    x = np.random.randn(1024, 256).astype(np.float32)
    return [jnp.asarray(adj), jnp.asarray(x)]


def get_init_inputs():
    return [256, 128, 16]
