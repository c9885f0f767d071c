import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Transposed 3D convolution (stride 2, NCDHW)."""

    def __init__(self, in_ch, out_ch, ksize):
        scale = 1.0 / np.sqrt(in_ch * ksize ** 3)
        self.w = jnp.asarray(
            (np.random.randn(in_ch, out_ch, ksize, ksize, ksize) * scale)
            .astype(np.float32)
        )

    def __call__(self, x):
        return jax.lax.conv_transpose(
            x, self.w, strides=(2, 2, 2), padding="VALID",
            dimension_numbers=("NCDHW", "IODHW", "NCDHW"),
        )


def get_inputs():
    x = np.random.randn(2, 16, 8, 16, 16).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [16, 8, 2]
