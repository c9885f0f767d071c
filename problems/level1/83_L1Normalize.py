import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Normalize rows to unit L1 norm."""

    def __init__(self):
        pass

    def __call__(self, x):
        return x / jnp.maximum(jnp.sum(jnp.abs(x), axis=-1, keepdims=True), 1e-8)


def get_inputs():
    x = np.random.randn(4096, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
