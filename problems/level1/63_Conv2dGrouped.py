import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Grouped 2D convolution (4 feature groups)."""

    def __init__(self, in_ch, out_ch, ksize, groups):
        self.groups = groups
        scale = 1.0 / np.sqrt(in_ch // groups * ksize * ksize)
        self.w = jnp.asarray(
            (np.random.randn(out_ch, in_ch // groups, ksize, ksize) * scale)
            .astype(np.float32)
        )

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.w, window_strides=(1, 1), padding="VALID",
            feature_group_count=self.groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )


def get_inputs():
    x = np.random.randn(8, 32, 64, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [32, 64, 3, 4]
