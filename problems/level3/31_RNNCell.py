import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Vanilla tanh RNN cell applied once."""

    def __init__(self, inp, hidden):
        self.wx = _mat(inp, hidden)
        self.wh = _mat(hidden, hidden)
        self.b = jnp.asarray(np.zeros(hidden, dtype=np.float32))

    def __call__(self, x, h):
        return jnp.tanh(x @ self.wx + h @ self.wh + self.b)


def get_inputs():
    x = np.random.randn(512, 512).astype(np.float32)
    h = np.random.randn(512, 1024).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(h)]


def get_init_inputs():
    return [512, 1024]
