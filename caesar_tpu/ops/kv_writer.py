"""Pallas page writer: DMA prefill K/V chunks into the paged pool.

Why a kernel: the XLA path (`kvcache.write_chunk_batch`) lowers the
page-id-indexed `.at[layer, flat_ids].set(...)` to a scatter that measured
~0.47 ms per 512-token row-layer on the 7B pool (~30-50 ms of a 2048-token
prefill dispatch — a quarter of its device time), while the actual data
moved is ~4 MB/layer (~5 us of DMA at HBM bandwidth).  This kernel is the
scatter reduced to what it physically is: one async VMEM->HBM copy per
written page, addressed by a scalar-prefetched page id.

Layout: the caller reshapes the chunk's K/V to page-major rows
[R, n_kv, page, hd] (R = P rows x pages-per-chunk — the same transpose the
XLA path does, fused for free), and the pool is aliased input->output so
the copies update it in place.  Page ids are data: rows never share a real
page (the allocator hands each sequence its own); padding rows all target
the reserved scratch page 0, where last-write-wins is benign (grid steps
run sequentially on the TPU core).

Reference seat: the reference has no KV cache at all (it calls external
LLM APIs — SURVEY.md §2.2); this is part of the owed paged-KV serving
stack (BASELINE north star).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    # scalar prefetch
    page_ids_ref,  # [R] int32 (SMEM)
    layer_ref,  # [1] int32
    # inputs
    k_new_ref,  # [1, n_kv, page, hd] VMEM block (this row)
    v_new_ref,
    k_pool_hbm,  # [L, n_pages, n_kv, page, hd] (ANY; aliased to output)
    v_pool_hbm,
    # outputs (aliased to the pools)
    k_out_hbm,
    v_out_hbm,
    # scratch
    sem,  # DMA sems [2]
):
    r = pl.program_id(0)
    layer = layer_ref[0]
    page_id = page_ids_ref[r]
    ck = pltpu.make_async_copy(
        k_new_ref.at[0], k_out_hbm.at[layer, page_id], sem.at[0]
    )
    cv = pltpu.make_async_copy(
        v_new_ref.at[0], v_out_hbm.at[layer, page_id], sem.at[1]
    )
    ck.start()
    cv.start()
    ck.wait()
    cv.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def write_pages(
    k_pages: jax.Array,  # [L, n_pages, n_kv, page, hd]
    v_pages: jax.Array,
    k_new: jax.Array,  # [R, n_kv, page, hd] page-major chunk rows
    v_new: jax.Array,
    page_ids: jax.Array,  # [R] int32
    layer: jax.Array,  # scalar int32
    interpret: bool = False,
):
    """Returns (k_pages, v_pages) with the rows written at page_ids."""
    r = k_new.shape[0]
    n_kv, page, hd = k_new.shape[1:]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(r,),
        in_specs=[
            pl.BlockSpec(
                (1, n_kv, page, hd),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_kv, page, hd),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
            jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype),
        ],
        # +2: indices count the scalar-prefetch operands first
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        page_ids,
        jnp.asarray(layer, dtype=jnp.int32).reshape(1),
        k_new,
        v_new,
        k_pages,
        v_pages,
    )
