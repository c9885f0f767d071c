import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """MLP-Mixer block: token-mixing MLP then channel-mixing MLP."""

    def __init__(self, tokens, dim, token_hidden, chan_hidden):
        self.t1, self.t2 = _mat(tokens, token_hidden), _mat(token_hidden, tokens)
        self.c1, self.c2 = _mat(dim, chan_hidden), _mat(chan_hidden, dim)
        self.g1 = jnp.asarray(np.ones(dim, dtype=np.float32))
        self.g2 = jnp.asarray(np.ones(dim, dtype=np.float32))

    def _ln(self, x, g):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * g

    def __call__(self, x):
        h = self._ln(x, self.g1).transpose(0, 2, 1)
        h = (jax.nn.gelu(h @ self.t1, approximate=True) @ self.t2)
        x = x + h.transpose(0, 2, 1)
        h = self._ln(x, self.g2)
        return x + jax.nn.gelu(h @ self.c1, approximate=True) @ self.c2


def get_inputs():
    x = np.random.randn(8, 256, 512).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 512, 1024, 2048]
