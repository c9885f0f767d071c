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
    """Temporal conv block: two dilated causal conv1d + residual."""

    def __init__(self, ch, dilation):
        self.d = dilation
        self.w1 = _c1w(ch, ch, 3)
        self.w2 = _c1w(ch, ch, 3)

    def _causal(self, x, w):
        pad = 2 * self.d
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
        return _conv1d(xp, w, dilation=self.d, padding="VALID")

    def __call__(self, x):
        h = jnp.maximum(self._causal(x, self.w1), 0.0)
        h = jnp.maximum(self._causal(h, self.w2), 0.0)
        return x + h


def get_inputs():
    x = np.random.randn(16, 64, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64, 4]
