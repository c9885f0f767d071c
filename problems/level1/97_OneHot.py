import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Integer ids to one-hot vectors."""

    def __init__(self, depth):
        self.depth = depth

    def __call__(self, ids):
        return jax.nn.one_hot(ids, self.depth, dtype=jnp.float32)


def get_inputs():
    ids = np.random.randint(0, 512, size=(4096,))
    return [jnp.asarray(ids)]


def get_init_inputs():
    return [512]
