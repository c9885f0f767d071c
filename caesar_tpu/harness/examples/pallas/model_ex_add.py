import jax
import jax.numpy as jnp


class Model:
    """Element-wise addition of two arrays."""

    def __init__(self):
        pass

    def __call__(self, a, b):
        return a + b


def get_inputs():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (4096, 4096), dtype=jnp.float32)
    b = jax.random.normal(k2, (4096, 4096), dtype=jnp.float32)
    return [a, b]


def get_init_inputs():
    return []
