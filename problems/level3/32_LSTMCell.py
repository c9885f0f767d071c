import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """LSTM cell applied once (returns the new hidden state)."""

    def __init__(self, inp, hidden):
        self.wx = _mat(inp, 4 * hidden)
        self.wh = _mat(hidden, 4 * hidden)
        self.b = jnp.asarray(np.zeros(4 * hidden, dtype=np.float32))

    def __call__(self, x, h, c):
        z = x @ self.wx + h @ self.wh + self.b
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        return jax.nn.sigmoid(o) * jnp.tanh(c2)


def get_inputs():
    x = np.random.randn(512, 512).astype(np.float32)
    h = np.random.randn(512, 768).astype(np.float32)
    c = np.random.randn(512, 768).astype(np.float32)
    return [jnp.asarray(x), jnp.asarray(h), jnp.asarray(c)]


def get_init_inputs():
    return [512, 768]
