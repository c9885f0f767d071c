import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Global average pooling over spatial dims (NCHW -> NC)."""

    def __init__(self):
        pass

    def __call__(self, x):
        return jnp.mean(x, axis=(2, 3))


def get_inputs():
    x = np.random.randn(32, 256, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
