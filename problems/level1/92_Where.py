import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Elementwise select by predicate."""

    def __init__(self):
        pass

    def __call__(self, cond, a, b):
        return jnp.where(cond, a, b)


def get_inputs():
    c = np.random.rand(4096, 1024) > 0.5
    a = np.random.randn(4096, 1024).astype(np.float32)
    b = np.random.randn(4096, 1024).astype(np.float32)
    return [jnp.asarray(c), jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
