import numpy as np
import jax
import jax.numpy as jnp

def _conv1d(x, w, dilation=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, w, (1,), padding, rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"))


def _c1w(o, i, k):
    return jnp.asarray(
        (np.random.randn(o, i, k) / np.sqrt(i * k)).astype(np.float32))


class Model:
    """Text CNN: embedding, parallel conv widths, max-over-time, linear."""

    def __init__(self, vocab, dim):
        self.table = jnp.asarray(
            (np.random.randn(vocab, dim) * 0.02).astype(np.float32))
        self.w3 = _c1w(64, dim, 3)
        self.w5 = _c1w(64, dim, 5)
        self.head = jnp.asarray(
            (np.random.randn(128, 4) / np.sqrt(128)).astype(np.float32))

    def __call__(self, ids):
        x = self.table[ids].transpose(0, 2, 1)  # [B, D, L]
        c3 = jnp.max(jnp.maximum(_conv1d(x, self.w3), 0.0), axis=-1)
        c5 = jnp.max(jnp.maximum(_conv1d(x, self.w5), 0.0), axis=-1)
        return jnp.concatenate([c3, c5], axis=-1) @ self.head


def get_inputs():
    ids = np.random.randint(0, 8192, size=(64, 256))
    return [jnp.asarray(ids)]


def get_init_inputs():
    return [8192, 128]
