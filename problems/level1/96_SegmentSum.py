import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Sum rows into segments by id."""

    def __init__(self, n_segments):
        self.n_segments = n_segments

    def __call__(self, x, seg):
        return jax.ops.segment_sum(x, seg, num_segments=self.n_segments)


def get_inputs():
    x = np.random.randn(16384, 256).astype(np.float32)
    seg = np.sort(np.random.randint(0, 128, size=(16384,)))
    return [jnp.asarray(x), jnp.asarray(seg)]


def get_init_inputs():
    return [128]
