import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """3D axis permutation [B, S, D] -> [D, B, S]."""

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.transpose(x, (2, 0, 1))


def get_inputs():
    x = np.random.randn(64, 512, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
