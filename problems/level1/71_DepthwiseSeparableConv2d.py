import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Depthwise-separable convolution: depthwise 3x3 then pointwise 1x1."""

    def __init__(self, in_ch, out_ch):
        self.ch = in_ch
        s1 = 1.0 / np.sqrt(9)
        s2 = 1.0 / np.sqrt(in_ch)
        self.dw = jnp.asarray(
            (np.random.randn(in_ch, 1, 3, 3) * s1).astype(np.float32)
        )
        self.pw = jnp.asarray(
            (np.random.randn(out_ch, in_ch, 1, 1) * s2).astype(np.float32)
        )

    def __call__(self, x):
        x = jax.lax.conv_general_dilated(
            x, self.dw, (1, 1), "SAME", feature_group_count=self.ch,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return jax.lax.conv_general_dilated(
            x, self.pw, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )


def get_inputs():
    x = np.random.randn(8, 32, 64, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 64]
