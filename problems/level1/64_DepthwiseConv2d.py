import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Depthwise 2D convolution (one filter per channel)."""

    def __init__(self, ch, ksize):
        self.ch = ch
        scale = 1.0 / np.sqrt(ksize * ksize)
        self.w = jnp.asarray(
            (np.random.randn(ch, 1, ksize, ksize) * scale).astype(np.float32)
        )

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.w, window_strides=(1, 1), padding="SAME",
            feature_group_count=self.ch,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )


def get_inputs():
    x = np.random.randn(8, 32, 64, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 3]
