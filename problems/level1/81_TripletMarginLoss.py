import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Triplet margin loss (margin = 1, euclidean)."""

    def __init__(self):
        pass

    def __call__(self, anchor, pos, neg):
        dp = jnp.linalg.norm(anchor - pos, axis=-1)
        dn = jnp.linalg.norm(anchor - neg, axis=-1)
        return jnp.mean(jnp.maximum(dp - dn + 1.0, 0.0))


def get_inputs():
    a = np.random.randn(4096, 256).astype(np.float32)
    p = np.random.randn(4096, 256).astype(np.float32)
    n = np.random.randn(4096, 256).astype(np.float32)
    return [jnp.asarray(a), jnp.asarray(p), jnp.asarray(n)]


def get_init_inputs():
    return []
