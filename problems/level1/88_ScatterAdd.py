import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Scatter-add rows of updates into a zero table."""

    def __init__(self, rows):
        self.rows = rows

    def __call__(self, idx, updates):
        out = jnp.zeros((self.rows, updates.shape[-1]), updates.dtype)
        return out.at[idx].add(updates)


def get_inputs():
    idx = np.random.randint(0, 1024, size=(8192,))
    upd = np.random.randn(8192, 256).astype(np.float32)
    return [jnp.asarray(idx), jnp.asarray(upd)]


def get_init_inputs():
    return [1024]
