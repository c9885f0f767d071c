import numpy as np
import jax
import jax.numpy as jnp

def _mat(m, n):
    return jnp.asarray((np.random.randn(m, n) / np.sqrt(m)).astype(np.float32))


class Model:
    """SIREN: MLP with sine activations and omega scaling."""

    def __init__(self, dims, omega):
        self.omega = omega
        self.ws = [
            _mat(m, n) for m, n in zip(dims[:-1], dims[1:])
        ]

    def __call__(self, x):
        for i, w in enumerate(self.ws):
            x = x @ w
            if i < len(self.ws) - 1:
                x = jnp.sin(self.omega * x)
        return x


def get_inputs():
    x = np.random.randn(4096, 64).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [[64, 256, 256, 256, 3], 30.0]
