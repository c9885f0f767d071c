import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Embedding table lookup."""

    def __init__(self, vocab, dim):
        self.table = jnp.asarray(
            (np.random.randn(vocab, dim) * 0.02).astype(np.float32)
        )

    def __call__(self, ids):
        return self.table[ids]


def get_inputs():
    ids = np.random.randint(0, 32768, size=(64, 512))
    return [jnp.asarray(ids)]


def get_init_inputs():
    return [32768, 512]
