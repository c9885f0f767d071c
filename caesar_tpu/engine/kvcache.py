"""Paged KV cache: fixed page pool + per-sequence page tables.

vLLM-style paging, laid out TPU-first:

* One pool per model: k/v arrays of shape
  [n_layers, n_pages, n_kv_heads, page_size, head_dim] — HEAD-MAJOR pages.
  (page_size, head_dim) are the minor dims, so the pool's DEFAULT layout is
  exactly the (8,128)-tiled form the prefill scatters/gathers and the
  attention dots want: with heads inside the page (the round-2 layout), XLA
  layout-assigned the whole pool to page-slot-sublane tiling and
  relayout-copied BOTH 2.6 GB pools on entry and exit of every batched
  prefill dispatch (it OOM'd the 7B bench compile).  Head-major also makes
  each head's page slice contiguous for the Pallas decode kernel.
* Page tables are data, not shapes: [B, max_pages] int32 arrays index the
  pool, so jit compiles the decode/prefill steps exactly once and sequences
  of any length share them.  Unused table slots point at page 0 and are
  masked by sequence length — never branched on.
* Storage dtype bf16 or float8_e4m3fn (FP8 halves KV HBM traffic — decode
  attention is bandwidth-bound); values upcast to bf16 on read next to the
  compute.  Page allocation/free/refcounting is host-side (allocator.py) —
  device code only ever gathers/scatters by page id, which is what makes
  cross-turn prefix sharing free: shared pages appear in many tables.

Capability note: this subsystem is new design space — the reference harness
has no serving engine at all (SURVEY.md §2.3); BASELINE.json's north star
specifies the FP8 paged KV + continuous batching requirement.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from caesar_tpu.engine.model import ModelSpec


def kv_dtype(name: str):
    if name == "bf16":
        return jnp.bfloat16
    if name == "fp8":
        return jnp.float8_e4m3fn
    if name == "f32":  # debug/parity-testing only
        return jnp.float32
    raise KeyError(f"Unknown kv dtype {name!r}")


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["k_pages", "v_pages"],
    meta_fields=["page_size"],
)
@dataclasses.dataclass
class PagedKVCache:
    k_pages: jax.Array  # [L, n_pages, n_kv, page_size, hd]
    v_pages: jax.Array
    page_size: int

    @property
    def n_pages(self) -> int:
        return self.k_pages.shape[1]

    @property
    def n_layers(self) -> int:
        return self.k_pages.shape[0]


def create_cache(
    spec: ModelSpec,
    n_pages: int,
    page_size: int,
    dtype_name: str = "bf16",
) -> PagedKVCache:
    dtype = kv_dtype(dtype_name)
    shape = (spec.n_layers, n_pages, spec.n_kv_heads, page_size, spec.head_dim)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, dtype=dtype),
        v_pages=jnp.zeros(shape, dtype=dtype),
        page_size=page_size,
    )


def cache_bytes(
    spec: ModelSpec, n_pages: int, page_size: int, dtype_name: str = "bf16"
) -> int:
    per_el = {"fp8": 1, "bf16": 2, "f32": 4}[dtype_name]
    return (
        2 * spec.n_layers * n_pages * page_size * spec.n_kv_heads
        * spec.head_dim * per_el
    )


# ----------------------------------------------------------------------
# device-side ops (pure, jit-friendly)
# ----------------------------------------------------------------------


def write_chunk(
    cache: PagedKVCache,
    layer: int,
    page_ids: jax.Array,  # [n_chunk_pages] int32
    k: jax.Array,  # [T, n_kv, hd] bf16, T == n_chunk_pages * page_size
    v: jax.Array,
) -> PagedKVCache:
    """Scatter a page-aligned prefill chunk's K/V into the pool."""
    t, n_kv, hd = k.shape
    pages = t // cache.page_size

    def pg(a, d):
        a = a.reshape(pages, cache.page_size, n_kv, hd)
        return a.transpose(0, 2, 1, 3).astype(d)  # [pages, n_kv, page, hd]

    kp = pg(k, cache.k_pages.dtype)
    vp = pg(v, cache.v_pages.dtype)
    return PagedKVCache(
        k_pages=cache.k_pages.at[layer, page_ids].set(kp),
        v_pages=cache.v_pages.at[layer, page_ids].set(vp),
        page_size=cache.page_size,
    )


def write_chunk_batch(
    cache: PagedKVCache,
    layer: int,
    page_ids: jax.Array,  # [P, n_chunk_pages] int32 — per-row chunk pages
    k: jax.Array,  # [P, T, n_kv, hd] bf16, T == n_chunk_pages * page_size
    v: jax.Array,
) -> PagedKVCache:
    """Scatter P sequences' page-aligned prefill chunks into the pool.

    Rows never share REAL pages (the allocator hands each sequence its own);
    padding rows all target the reserved scratch page 0, where overlapping
    writes are benign (page 0 is never read unmasked)."""
    p, t, n_kv, hd = k.shape
    pages = t // cache.page_size

    def pg(a, d):
        a = a.reshape(p * pages, cache.page_size, n_kv, hd)
        return a.transpose(0, 2, 1, 3).astype(d)  # [rows, n_kv, page, hd]

    kp = pg(k, cache.k_pages.dtype)
    vp = pg(v, cache.v_pages.dtype)
    flat_ids = page_ids.reshape(-1)
    return PagedKVCache(
        k_pages=cache.k_pages.at[layer, flat_ids].set(kp),
        v_pages=cache.v_pages.at[layer, flat_ids].set(vp),
        page_size=cache.page_size,
    )


def write_chunk_batch_kernel(
    cache: PagedKVCache,
    layer,
    page_ids: jax.Array,  # [P, n_chunk_pages] int32
    k: jax.Array,  # [P, T, n_kv, hd]
    v: jax.Array,
    interpret: bool = False,
) -> PagedKVCache:
    """write_chunk_batch via the Pallas page-writer DMA kernel
    (ops/kv_writer.py) — the XLA scatter it replaces measured ~0.47 ms
    per 512-token row-layer on the 7B pool (~a quarter of a prefill
    dispatch's device time) for ~5 us of actual data movement."""
    from caesar_tpu.ops.kv_writer import write_pages

    p, t, n_kv, hd = k.shape
    pages = t // cache.page_size

    def pg(a, d):
        a = a.reshape(p * pages, cache.page_size, n_kv, hd)
        return a.transpose(0, 2, 1, 3).astype(d)  # [R, n_kv, page, hd]

    kp, vp = write_pages(
        cache.k_pages,
        cache.v_pages,
        pg(k, cache.k_pages.dtype),
        pg(v, cache.v_pages.dtype),
        page_ids.reshape(-1),
        jnp.asarray(layer, jnp.int32),
        interpret=interpret,
    )
    return PagedKVCache(k_pages=kp, v_pages=vp, page_size=cache.page_size)


def write_token(
    cache: PagedKVCache,
    layer: int,
    page_ids: jax.Array,  # [B] int32 — page holding each sequence's position
    slots: jax.Array,  # [B] int32 — offset within that page
    k: jax.Array,  # [B, n_kv, hd]
    v: jax.Array,
) -> PagedKVCache:
    """Scatter one decode token per sequence into the pool."""
    kc = k.astype(cache.k_pages.dtype)
    vc = v.astype(cache.v_pages.dtype)
    # ADJACENT advanced indices [B, n_kv] for (page, head, slot): a sliced
    # head dim between two advanced indices (`[layer, page_ids, :, slots]`)
    # lowers to a transposing scatter that copies the pool every decode
    # step (measured 8+ ms/step at the 7B pool)
    heads = jnp.arange(cache.k_pages.shape[2], dtype=page_ids.dtype)
    pg = page_ids[:, None]  # [B, 1] -> broadcast [B, n_kv]
    sl = slots[:, None]
    return PagedKVCache(
        k_pages=cache.k_pages.at[layer, pg, heads[None, :], sl].set(kc),
        v_pages=cache.v_pages.at[layer, pg, heads[None, :], sl].set(vc),
        page_size=cache.page_size,
    )


def gather_kv(
    cache: PagedKVCache,
    layer: int,
    page_table: jax.Array,  # [B, max_pages] int32
) -> Tuple[jax.Array, jax.Array]:
    """Gather each sequence's K/V, HEAD-MAJOR:
    -> [B, n_kv, max_pages*page_size, hd] bf16.

    The XLA reference path (the paged-attention Pallas kernel reads pages
    directly from HBM instead); positions beyond a sequence's length contain
    stale pool data and MUST be masked by the caller.
    """
    b, max_pages = page_table.shape
    compute_dtype = (
        jnp.float32 if cache.k_pages.dtype == jnp.float32 else jnp.bfloat16
    )
    k = cache.k_pages[layer][page_table]  # [B, P, n_kv, page, hd]
    v = cache.v_pages[layer][page_table]
    s = max_pages * cache.page_size
    n_kv, hd = k.shape[2], k.shape[4]
    k = k.transpose(0, 2, 1, 3, 4).reshape(b, n_kv, s, hd).astype(compute_dtype)
    v = v.transpose(0, 2, 1, 3, 4).reshape(b, n_kv, s, hd).astype(compute_dtype)
    return k, v
