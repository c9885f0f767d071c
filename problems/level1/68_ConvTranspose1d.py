import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Transposed 1D convolution (stride 2)."""

    def __init__(self, in_ch, out_ch, ksize):
        scale = 1.0 / np.sqrt(in_ch * ksize)
        self.w = jnp.asarray(
            (np.random.randn(in_ch, out_ch, ksize) * scale).astype(np.float32)
        )

    def __call__(self, x):
        return jax.lax.conv_transpose(
            x, self.w, strides=(2,), padding="VALID",
            dimension_numbers=("NCH", "IOH", "NCH"),
        )


def get_inputs():
    x = np.random.randn(16, 32, 1024).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 16, 4]
