import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """LSTM unrolled over a sequence with lax.scan."""

    def __init__(self, inp, hidden):
        self.hidden = hidden
        self.wx = _mat(inp, 4 * hidden)
        self.wh = _mat(hidden, 4 * hidden)

    def __call__(self, x):
        b = x.shape[0]
        h0 = jnp.zeros((b, self.hidden), jnp.float32)
        c0 = jnp.zeros((b, self.hidden), jnp.float32)

        def step(carry, xt):
            h, c = carry
            z = xt @ self.wx + h @ self.wh
            i, f, g, o = jnp.split(z, 4, axis=-1)
            c2 = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h2 = jax.nn.sigmoid(o) * jnp.tanh(c2)
            return (h2, c2), h2

        _, hs = jax.lax.scan(step, (h0, c0), x.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)


def get_inputs():
    x = np.random.randn(64, 128, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 512]
