import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """3D tensor times matrix over the last axis: [B, S, K] @ [K, N]."""

    def __init__(self):
        pass

    def __call__(self, x, w):
        return jnp.einsum("bsk,kn->bsn", x, w)


def get_inputs():
    x = np.random.randn(8, 512, 512).astype(np.float32)
    w = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(w)]


def get_init_inputs():
    return []
