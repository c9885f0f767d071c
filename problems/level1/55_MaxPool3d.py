import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """3D max pooling, 2x2x2 stride 2 (NCDHW)."""

    def __init__(self):
        pass

    def __call__(self, x):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            (1, 1, 2, 2, 2), (1, 1, 2, 2, 2), "VALID"
        )


def get_inputs():
    x = np.random.randn(8, 16, 16, 32, 32).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return []
