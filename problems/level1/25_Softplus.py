import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Softplus activation log(1 + e^x)."""

    def __init__(self):
        pass

    def __call__(self, x):
        return jax.nn.softplus(x)


def get_inputs():
    x = np.random.randn(4096, 4096).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
