import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Mish activation: x * tanh(softplus(x))."""

    def __init__(self):
        pass

    def __call__(self, x):
        return x * jnp.tanh(jax.nn.softplus(x))


def get_inputs():
    x = np.random.randn(4096, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
