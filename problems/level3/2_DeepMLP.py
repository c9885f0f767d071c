import numpy as np
import jax
import jax.numpy as jnp

class Model:
    """Six-layer MLP with GELU activations and a narrow waist."""

    def __init__(self, dims):
        self.ws = []
        self.bs = []
        for din, dout in zip(dims[:-1], dims[1:]):
            scale = 1.0 / np.sqrt(din)
            self.ws.append(
                jnp.asarray((np.random.randn(din, dout) * scale).astype(np.float32))
            )
            self.bs.append(jnp.asarray(np.zeros(dout, dtype=np.float32)))

    def __call__(self, x):
        for i, (w, b) in enumerate(zip(self.ws, self.bs)):
            x = x @ w + b
            if i < len(self.ws) - 1:
                x = jax.nn.gelu(x, approximate=True)
        return x


def get_inputs():
    x = np.random.randn(256, 512).astype(np.float32)
    return [jnp.asarray(x)]


def get_init_inputs():
    return [[512, 1024, 512, 256, 512, 1024, 128]]
