import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """GRU unrolled over a sequence with lax.scan."""

    def __init__(self, inp, hidden):
        self.hidden = hidden
        self.wx = _mat(inp, 3 * hidden)
        self.wh = _mat(hidden, 3 * hidden)

    def __call__(self, x):
        b = x.shape[0]
        h0 = jnp.zeros((b, self.hidden), jnp.float32)

        def step(h, xt):
            zx = xt @ self.wx
            zh = h @ self.wh
            xr, xz, xn = jnp.split(zx, 3, axis=-1)
            hr, hz, hn = jnp.split(zh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h2 = (1.0 - z) * n + z * h
            return h2, h2

        _, hs = jax.lax.scan(step, h0, x.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)


def get_inputs():
    x = np.random.randn(64, 128, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 512]
