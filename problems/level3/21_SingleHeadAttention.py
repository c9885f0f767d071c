import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Single-head self-attention with projections."""

    def __init__(self, dim):
        self.wq, self.wk, self.wv, self.wo = (
            _mat(dim, dim), _mat(dim, dim), _mat(dim, dim), _mat(dim, dim))
        self.dim = dim

    def __call__(self, x):
        q, k, v = x @ self.wq, x @ self.wk, x @ self.wv
        scores = q @ k.T / jnp.sqrt(jnp.float32(self.dim))
        return (jax.nn.softmax(scores, axis=-1) @ v) @ self.wo


def get_inputs():
    x = np.random.randn(1024, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256]
