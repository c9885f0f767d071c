"""Paged-attention PREFILL kernel: blockwise flash attention over KV pages.

Why a kernel (round-3 VERDICT #2): the XLA prefill path materializes
[P, n_kv, group, T, S] f32 scores per layer — ~470 MB per materialization
at the config-3 dispatch shape (4 rows x 512 tokens against a 2048-token
window), twice per layer (scores + probs), which both throttled prefill to
~2k tok/s and drove the round-3 HBM OOM.  This kernel streams KV pages
through VMEM in superblocks and keeps the flash state (running max /
normalizer / accumulator) in registers, so score traffic never touches HBM.

Prefill is COMPUTE-bound (T queries per row, not 1), so unlike the decode
kernel (ops/paged_attention.py) the dots run in bf16 on the MXU — f32
operands would cost 8x MXU rate; accumulation stays f32 via
preferred_element_type and the flash carry.

Layout:

* q arrives HEAD-MAJOR [P, n_kv, group, T, hd] (the caller transposes from
  the projection's [P, T, heads, hd] — one cheap XLA transpose per layer);
  the per-grid-step block is [1, n_kv, group, BT, hd] so each kv head's
  query slab reshapes to a contiguous [group*BT, hd] MXU operand.
* Grid (P, T // BT): one step per (row, query block).  Each step walks the
  row's KV prefix in SBLK-token superblocks (SUPER_P pages DMA'd per
  block, double-buffered), masked causally: k_pos <= start + qb*BT + t.
  The loop bound ceil((start + (qb+1)*BT) / SBLK) is traced — short rows
  in a batched dispatch do proportionally less work.
* KV pages live in the pool [L, n_pages, n_kv, page, hd] in HBM; page ids
  come from the scalar-prefetched tables.  Tail page ids past the row's
  written length clamp to the reserved scratch page 0 (never uninitialized
  VMEM) and are causally masked.
* INVARIANT (relied on by n_pages_row): the caller allocates and writes
  ALL ceil((start + chunk) / page_size) pages of the dispatched chunk,
  even when the final chunk is partial — the engine allocates
  n_chunk_pages unconditionally per chunk and the page writer fills them
  (padding tokens land in the allocated tail page).  If allocation ever
  became real_t-based, the tail DMAs here would read unwritten page-table
  slots.  engine._prefill_one_chunk asserts this after allocation.
* FP8 pools upcast via the same integer bit trick as the decode kernel
  (_upcast_kv), then to bf16 for the MXU.

Reference seat: the harness this engine serves has no attention kernels at
all (the reference calls external LLM APIs — SURVEY.md §2.2); this kernel
fills the BASELINE north star's "FP8 KV-cache attention (paged /
continuous-batching) Pallas kernels" requirement for the prefill half of
the serving path (decode half: ops/paged_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caesar_tpu.ops.paged_attention import _upcast_kv

NEG_INF = -1e30
#: starting tokens per KV superblock (shrunk by the VMEM fit below)
SBLK_TOKENS = 256
#: starting query-block rows per grid step (shrunk by the VMEM fit below)
BT_MAX = 256
#: scoped-VMEM target for the kernel's working set.  The hardware limit is
#: 16 MB and Mosaic's stack accounting (double-buffered q/out blocks, the
#: f32 score/prob transients, flash carries, KV superblock buffers) tracks
#: the _vmem_est model to ~20%: 256x256 geometry at 7B shapes measured
#: 18.5 MB on-device (compile-time OOM), the model said 15.2 — the target
#: leaves that margin under the 16 MB limit.
_VMEM_TARGET = int(11.5 * 2 ** 20)


def _pick_bt(t: int, cap: int = BT_MAX) -> int:
    bt = min(t, cap)
    while t % bt:
        bt //= 2
    return max(bt, 1)


def _vmem_est(
    bt: int, sblk: int, n_kv: int, group: int, hd: int, kv_bytes: int
) -> int:
    """Scoped-VMEM model CALIBRATED against on-device compiles at the 7B
    shapes (n_kv=4, group=7, hd=128): (bt=128, sblk=128) measured 17.73 MB,
    (128, 64) 17.37 MB — i.e. score-shaped buffers pad their lane dim to
    128 (sblk < 128 saves only the KV DMA buffers) and Mosaic's real stack
    runs ~1.54x the naive sum (where-copies, exp temps, q copy, alpha
    broadcasts).  Both are folded in below."""
    heads_rows = n_kv * group * bt
    sblk_eff = max(sblk, 128)  # lane-dim padding
    naive = (
        2 * heads_rows * sblk_eff * 4  # scores + probs f32 transients
        + 2 * heads_rows * hd * 4  # acc carry + pv transient f32
        + 2 * 2 * heads_rows * hd * 2  # q + out blocks, double-buffered
        + 2 * 2 * n_kv * sblk * hd * kv_bytes  # K/V superblock buffers
    )
    return int(naive * 1.54)


#: (bt, sblk) preference order: biggest MXU blocks first, balanced shrink
_GEOMETRIES = (
    (256, 256), (256, 128), (128, 256), (128, 128), (128, 64),
    (64, 128), (64, 64), (32, 64), (32, 32), (32, 16), (32, 8),
)


def _pick_geometry(
    t: int, page_size: int, n_kv: int, group: int, hd: int, kv_bytes: int
) -> tuple:
    """First (bt, sblk) candidate that fits the VMEM target, with bt
    adjusted to divide the chunk and sblk to whole pages."""
    import os

    forced_bt = int(os.environ.get("CAESAR_PREFILL_BT", "0"))
    forced_sblk = int(os.environ.get("CAESAR_PREFILL_SBLK", "0"))
    if forced_bt and forced_sblk:  # tuning sweeps only
        bt = _pick_bt(t, forced_bt)
        sblk = max(forced_sblk // page_size, 1) * page_size
        if _vmem_est(bt, sblk, n_kv, group, hd, kv_bytes) > _VMEM_TARGET:
            import warnings

            warnings.warn(
                f"forced prefill geometry (bt={bt}, sblk={sblk}) estimates "
                f"{_vmem_est(bt, sblk, n_kv, group, hd, kv_bytes) / 2**20:.1f}"
                f" MB of scoped VMEM (> target "
                f"{_VMEM_TARGET / 2**20:.1f} MB) and may fail to compile"
            )
        return bt, sblk
    for cand_bt, cand_sblk in _GEOMETRIES:
        bt = _pick_bt(t, cand_bt)
        sblk = max(cand_sblk // page_size, 1) * page_size
        if _vmem_est(bt, sblk, n_kv, group, hd, kv_bytes) <= _VMEM_TARGET:
            return bt, sblk
    return _pick_bt(t, 32), page_size


def _kernel(
    # scalar prefetch
    tables_ref,  # [P, W] int32 (SMEM)
    starts_ref,  # [P] int32 — absolute position of each row's first query
    layer_ref,  # [1] int32
    # inputs
    q_ref,  # [1, n_kv, group, BT, hd] VMEM (pre-scaled by 1/sqrt(hd))
    k_hbm,  # [L, n_pages, n_kv, page, hd] (full pool, stays in HBM)
    v_hbm,
    # output
    out_ref,  # [1, n_kv, group, BT, hd] VMEM
    # scratch
    k_buf,  # [2, n_kv, SBLK, hd] VMEM (double-buffered superblock)
    v_buf,
    sem,  # DMA sems [2, SUPER_P, 2]
    *,
    page_size: int,
    bt: int,
):
    i = pl.program_id(0)
    qb = pl.program_id(1)
    layer = layer_ref[0]
    n_kv, group, _, hd = q_ref.shape[1:]
    sblk = k_buf.shape[2]
    super_p = sblk // page_size

    start = starts_ref[i]
    q_base = start + qb * bt  # absolute position of this block's first query
    # KV tokens this block may attend to: positions 0 .. q_base + bt - 1
    n_blocks = pl.cdiv(q_base + bt, sblk)
    # pages actually written for this row (clamp tail DMAs to scratch 0)
    n_pages_row = pl.cdiv(start + bt * pl.num_programs(1), page_size)

    def _page_id(j, p):
        page_idx = j * super_p + p
        idx_c = jnp.minimum(page_idx, tables_ref.shape[1] - 1)
        return jnp.where(page_idx < n_pages_row, tables_ref[i, idx_c], 0)

    def _copies(j, slot, p):
        page_id = _page_id(j, p)
        dst = pl.ds(p * page_size, page_size)
        return (
            pltpu.make_async_copy(
                k_hbm.at[layer, page_id], k_buf.at[slot, :, dst],
                sem.at[slot, p, 0],
            ),
            pltpu.make_async_copy(
                v_hbm.at[layer, page_id], v_buf.at[slot, :, dst],
                sem.at[slot, p, 1],
            ),
        )

    def start_block(j, slot):
        for p in range(super_p):
            ck, cv = _copies(j, slot, p)
            ck.start()
            cv.start()

    def wait_block(j, slot):
        for p in range(super_p):
            ck, cv = _copies(j, slot, p)
            ck.wait()
            cv.wait()

    q = q_ref[0].reshape(n_kv, group * bt, hd).astype(jnp.bfloat16)

    # mask geometry depends only on (t, s): keep the iotas [BT, SBLK] and
    # broadcast at the where — score-shaped i32 iotas (3 x ~1.8 MB at 7B
    # shapes) were the scoped-VMEM OOM's main line item
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (bt, sblk), dimension=0)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (bt, sblk), dimension=1)

    def _to_bf16(tile):
        if tile.dtype == jnp.bfloat16:
            return tile  # no f32 round-trip copy for bf16 pools
        return _upcast_kv(tile).astype(jnp.bfloat16)

    start_block(0, 0)

    def body(j, carry):
        m_prev, l_prev, acc_prev = carry
        slot = jax.lax.rem(j, 2)
        # prefetch the next superblock into the other slot first
        @pl.when(j + 1 < n_blocks)
        def _():
            start_block(j + 1, 1 - slot)

        wait_block(j, slot)
        k = _to_bf16(k_buf[slot])  # [n_kv, SBLK, hd]
        v = _to_bf16(v_buf[slot])

        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [n_kv, group*BT, SBLK]
        mask2d = (j * sblk + s_iota) <= (q_base + t_iota)  # [BT, SBLK]
        scores = jnp.where(
            mask2d[None, None],
            scores.reshape(n_kv, group, bt, sblk),
            NEG_INF,
        ).reshape(n_kv, group * bt, sblk)

        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p_ = jnp.exp(scores - m_new[..., None])
        l_new = l_prev * alpha + jnp.sum(p_, axis=-1)
        pv = jax.lax.dot_general(
            p_.astype(jnp.bfloat16), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [n_kv, group*BT, hd]
        acc_new = acc_prev * alpha[..., None] + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((n_kv, group * bt), NEG_INF, jnp.float32)
    l0 = jnp.zeros((n_kv, group * bt), jnp.float32)
    acc0 = jnp.zeros((n_kv, group * bt, hd), jnp.float32)
    _m, l_fin, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))

    # every query attends to at least itself, so l_fin >= exp(0) > 0
    out = acc / l_fin[..., None]
    out_ref[0] = out.reshape(n_kv, group, bt, hd).astype(out_ref.dtype)


def supports(spec, page_size: int, chunk: int) -> bool:
    """Mosaic tiling constraints (lane dim = head_dim) plus the block
    geometry: superblocks must be whole pages, chunks whole query blocks."""
    return (
        spec.head_dim % 128 == 0
        and page_size % 8 == 0
        and SBLK_TOKENS % page_size == 0
        and spec.n_heads % spec.n_kv_heads == 0
        and chunk % _pick_bt(chunk) == 0
    )


@functools.partial(
    jax.jit, static_argnames=("page_size", "interpret")
)
def prefill_attention(
    q: jax.Array,  # [P, T, n_heads, hd] — the chunk's query projections
    k_pages: jax.Array,  # [L, n_pages, n_kv, page, hd] (FULL pool)
    v_pages: jax.Array,
    page_tables: jax.Array,  # [P, W] int32
    starts: jax.Array,  # [P] int32 — first query's absolute position
    layer: jax.Array,  # scalar int32
    page_size: int,
    interpret: bool = False,
) -> jax.Array:
    """Causal attention of a prefill chunk over its pages (chunk KV already
    written to the pool).  Returns [P, T, n_heads, hd] in q's dtype."""
    b, t, n_heads, hd = q.shape
    n_kv = k_pages.shape[2]
    group = n_heads // n_kv
    bt, sblk = _pick_geometry(
        t, page_size, n_kv, group, hd, k_pages.dtype.itemsize
    )
    super_p = sblk // page_size

    scale = 1.0 / (hd ** 0.5)
    qh = (q.astype(jnp.float32) * scale).astype(q.dtype)
    # head-major for contiguous per-head MXU operands
    qh = qh.reshape(b, t, n_kv, group, hd).transpose(0, 2, 3, 1, 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, t // bt),
        in_specs=[
            pl.BlockSpec(
                (1, n_kv, group, bt, hd),
                lambda i, j, *_: (i, 0, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # K pool stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V pool stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, n_kv, group, bt, hd),
            lambda i, j, *_: (i, 0, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n_kv, sblk, hd), k_pages.dtype),
            pltpu.VMEM((2, n_kv, sblk, hd), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, super_p, 2)),
        ],
    )
    kernel = functools.partial(_kernel, page_size=page_size, bt=bt)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_kv, group, t, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        page_tables,
        starts,
        jnp.asarray(layer, dtype=jnp.int32).reshape(1),
        qh,
        k_pages,
        v_pages,
    )
    # back to [P, T, n_heads, hd]
    return out.transpose(0, 3, 1, 2, 4).reshape(b, t, n_heads, hd)
