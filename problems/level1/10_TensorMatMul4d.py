import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """4D tensor times matrix over the last axis: [A, B, S, K] @ [K, N]."""

    def __init__(self):
        pass

    def __call__(self, x, w):
        return jnp.einsum("absk,kn->absn", x, w)


def get_inputs():
    x = np.random.randn(4, 8, 128, 256).astype(np.float32)
    w = np.random.randn(256, 512).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(w)]


def get_init_inputs():
    return []
