import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Dense autoencoder: 1024 -> 64 bottleneck -> 1024."""

    def __init__(self, dims):
        def mat(m, n):
            return jnp.asarray(
                (np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))

        self.enc = [mat(m, n) for m, n in zip(dims[:-1], dims[1:])]
        rev = dims[::-1]
        self.dec = [mat(m, n) for m, n in zip(rev[:-1], rev[1:])]

    def __call__(self, x):
        for w in self.enc:
            x = jnp.maximum(x @ w, 0.0)
        for i, w in enumerate(self.dec):
            x = x @ w
            if i < len(self.dec) - 1:
                x = jnp.maximum(x, 0.0)
        return x


def get_inputs():
    x = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [[1024, 512, 64]]
