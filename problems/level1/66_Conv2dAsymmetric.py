import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """2D convolution with an asymmetric 1x7 kernel."""

    def __init__(self, in_ch, out_ch):
        scale = 1.0 / np.sqrt(in_ch * 7)
        self.w = jnp.asarray(
            (np.random.randn(out_ch, in_ch, 1, 7) * scale).astype(np.float32)
        )

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )


def get_inputs():
    x = np.random.randn(8, 16, 64, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [16, 32]
