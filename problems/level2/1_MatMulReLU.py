import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Linear layer followed by ReLU."""

    def __init__(self, in_f, out_f):
        scale = 1.0 / np.sqrt(in_f)
        self.w = jnp.asarray((np.random.randn(in_f, out_f) * scale).astype(np.float32))
        self.b = jnp.asarray(np.zeros(out_f, dtype=np.float32))

    def __call__(self, x):
        return jnp.maximum(x @ self.w + self.b, 0.0)


def get_inputs():
    x = np.random.randn(1024, 2048).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [2048, 2048]
