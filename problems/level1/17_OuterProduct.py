import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Outer product of two vectors."""

    def __init__(self):
        pass

    def __call__(self, a, b):
        return jnp.outer(a, b)


def get_inputs():
    a = np.random.randn(2048).astype(np.float32)
    b = np.random.randn(2048).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(b)]


def get_init_inputs():
    return []
