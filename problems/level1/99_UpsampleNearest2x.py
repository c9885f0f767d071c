import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Nearest-neighbor 2x spatial upsampling (NCHW)."""

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


def get_inputs():
    x = np.random.randn(8, 32, 64, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
