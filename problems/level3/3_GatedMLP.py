import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """GEGLU feed-forward: (gelu(x Wg) * (x Wu)) Wd."""

    def __init__(self, dim, hidden):
        s1 = 1.0 / np.sqrt(dim)
        s2 = 1.0 / np.sqrt(hidden)
        self.wg = jnp.asarray((np.random.randn(dim, hidden) * s1).astype(np.float32))
        self.wu = jnp.asarray((np.random.randn(dim, hidden) * s1).astype(np.float32))
        self.wd = jnp.asarray((np.random.randn(hidden, dim) * s2).astype(np.float32))

    def __call__(self, x):
        g = jax.nn.gelu(x @ self.wg, approximate=True)
        return (g * (x @ self.wu)) @ self.wd


def get_inputs():
    x = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [1024, 2816]
