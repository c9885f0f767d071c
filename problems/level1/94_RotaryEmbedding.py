import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Apply rotary position embedding (split-half convention)."""

    def __init__(self, head_dim):
        self.head_dim = head_dim

    def __call__(self, x, positions):
        half = self.head_dim // 2
        freqs = 10000.0 ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
        ang = positions.astype(jnp.float32)[:, None] * freqs  # [S, half]
        cos = jnp.cos(ang)[None, :, None, :]
        sin = jnp.sin(ang)[None, :, None, :]
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )


def get_inputs():
    x = np.random.randn(8, 512, 16, 128).astype(np.float32)
    pos = np.arange(512)
    return [jnp.asarray(x), jnp.asarray(pos)]


def get_init_inputs():
    return [128]
