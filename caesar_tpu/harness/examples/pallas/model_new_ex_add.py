import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _add_kernel(a_ref, b_ref, out_ref):
    out_ref[:] = a_ref[:] + b_ref[:]


@jax.jit
def pallas_add(a, b):
    block = (256, 128)
    grid = (pl.cdiv(a.shape[0], block[0]), pl.cdiv(a.shape[1], block[1]))
    return pl.pallas_call(
        _add_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(a, b)


class ModelNew:
    """Element-wise addition using a custom Pallas TPU kernel."""

    def __init__(self):
        pass

    def __call__(self, a, b):
        return pallas_add(a, b)


def get_inputs():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (4096, 4096), dtype=jnp.float32)
    b = jax.random.normal(k2, (4096, 4096), dtype=jnp.float32)
    return [a, b]


def get_init_inputs():
    return []
