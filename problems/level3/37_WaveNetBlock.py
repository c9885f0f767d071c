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
    """WaveNet residual block: gated dilated conv with skip output."""

    def __init__(self, ch, dilation):
        self.d = dilation
        self.wf = _c1w(ch, ch, 2)
        self.wg = _c1w(ch, ch, 2)
        self.wr = _c1w(ch, ch, 1)
        self.ws = _c1w(ch, ch, 1)

    def __call__(self, x):
        pad = self.d
        xp = jnp.pad(x, ((0, 0), (0, 0), (pad, 0)))
        f = jnp.tanh(_conv1d(xp, self.wf, dilation=self.d, padding="VALID"))
        g = jax.nn.sigmoid(
            _conv1d(xp, self.wg, dilation=self.d, padding="VALID"))
        z = f * g
        res = x + _conv1d(z, self.wr)
        skip = _conv1d(z, self.ws)
        return res + skip


def get_inputs():
    x = np.random.randn(8, 64, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [64, 8]
