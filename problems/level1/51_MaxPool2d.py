import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """2x2 max pooling, stride 2 (NCHW)."""

    def __init__(self):
        pass

    def __call__(self, x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 1, 2, 2),
            window_strides=(1, 1, 2, 2),
            padding="VALID",
        )


def get_inputs():
    x = np.random.randn(16, 32, 128, 128).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
