import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """Dense mixture-of-experts: softmax routing over 4 expert FFNs."""

    def __init__(self, dim, hidden, experts):
        self.router = _mat(dim, experts)
        self.w1 = jnp.asarray(
            (np.random.randn(experts, dim, hidden) / np.sqrt(dim))
            .astype(np.float32))
        self.w2 = jnp.asarray(
            (np.random.randn(experts, hidden, dim) / np.sqrt(hidden))
            .astype(np.float32))

    def __call__(self, x):
        gates = jax.nn.softmax(x @ self.router, axis=-1)  # [T, E]
        h = jnp.einsum("td,edh->teh", x, self.w1)
        h = jnp.maximum(h, 0.0)
        y = jnp.einsum("teh,ehd->ted", h, self.w2)
        return jnp.einsum("te,ted->td", gates, y)


def get_inputs():
    x = np.random.randn(1024, 256).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [256, 512, 4]
