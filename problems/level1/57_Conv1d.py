import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """1D convolution (NCL, OIL weights, VALID padding)."""

    def __init__(self, in_ch, out_ch, ksize):
        scale = 1.0 / np.sqrt(in_ch * ksize)
        self.w = jnp.asarray(
            (np.random.randn(out_ch, in_ch, ksize) * scale).astype(np.float32)
        )

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )


def get_inputs():
    x = np.random.randn(16, 32, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 64, 5]
