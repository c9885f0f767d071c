import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Embedding mean-pool followed by a two-layer classifier."""

    def __init__(self, vocab, dim):
        self.table = jnp.asarray(
            (np.random.randn(vocab, dim) * 0.02).astype(np.float32))
        self.w1 = jnp.asarray(
            (np.random.randn(dim, 256) / np.sqrt(dim)).astype(np.float32))
        self.w2 = jnp.asarray(
            (np.random.randn(256, 16) / 16.0).astype(np.float32))

    def __call__(self, ids):
        x = jnp.mean(self.table[ids], axis=1)
        return jnp.maximum(x @ self.w1, 0.0) @ self.w2


def get_inputs():
    ids = np.random.randint(0, 16384, size=(128, 512))
    return [jnp.asarray(ids)]


def get_init_inputs():
    return [16384, 256]
