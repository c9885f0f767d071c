import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Three highway layers: gated mix of transform and carry."""

    def __init__(self, dim, layers):
        self.ws = [_mat(dim, dim) for _ in range(layers)]
        self.wt = [_mat(dim, dim) for _ in range(layers)]

    def __call__(self, x):
        for w, wt in zip(self.ws, self.wt):
            h = jnp.maximum(x @ w, 0.0)
            t = jax.nn.sigmoid(x @ wt - 1.0)
            x = h * t + x * (1.0 - t)
        return x


def get_inputs():
    x = np.random.randn(1024, 512).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [512, 3]
