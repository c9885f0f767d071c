import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """C = A @ A.T — a symmetric (Gram) matrix product."""

    def __init__(self):
        pass

    def __call__(self, a):
        return a @ a.T


def get_inputs():
    a = np.random.randn(1024, 2048).astype(np.float32)
    return [jnp.asarray(a)]


def get_init_inputs():
    return []
