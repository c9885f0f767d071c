"""Paged-attention decode kernel: flash-style attention over KV pages.

Why a kernel: the XLA fallback (kvcache.gather_kv) materializes every
sequence's FULL static page table — [B, max_pages*page_size, n_kv, hd] —
into HBM and reads it back for the einsum, so a decode step pays ~3x the
theoretical KV traffic and pays it for max_seq_len even when sequences are
short.  This kernel instead:

* keeps the page pools in HBM (no blocked in_spec) and DMAs exactly the
  pages a sequence uses — the loop bound is the per-sequence page count,
  a traced value, not the static max;
* double-buffers page DMA against compute (guide pattern), so the HBM
  stream never stalls on the VPU/MXU work;
* runs flash-style online softmax (running max / normalizer carried through
  the page loop in f32), one grid step per sequence;
* upcasts KV tiles to bf16 in VMEM right before use — FP8 page storage
  halves the stream for free.

Layout: one grid step per batch row; q [1, n_heads, hd] in VMEM; K/V page
tiles [page_size, n_kv, hd].  GQA runs as [n_kv, group, hd] x
[page, n_kv, hd] dot_generals per page.

Page tables and positions arrive via scalar prefetch (SMEM) so the kernel
can compute its own DMA source indices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

NEG_INF = -1e30
#: pages DMA'd + processed per flash iteration (see _kernel docstring);
#: env-overridable for tuning sweeps
SUPER = int(os.environ.get("CAESAR_ATTN_SUPER", "4"))
DEPTH = 2  # superblock double buffering (DEPTH*SUPER*2 page DMAs in flight)


def _upcast_kv(tile: jax.Array) -> jax.Array:
    """KV tile -> f32 for the flash math.

    fp8_e4m3 decodes via integer bit manipulation instead of astype: v5e has
    no native fp8 datapath, so XLA's convert is an emulation that measured
    ~6x slower than the whole bf16 attention call (0.52 vs 0.086 ms/layer).
    The trick places sign at f32 bit 31 and the 7 exponent+mantissa bits at
    f32 bits 26..20, bitcasts, and rescales by 2^(127-7): normals land
    exactly, and e=0 subnormals are ALSO exact (m*2^-129 * 2^120 = m/512,
    the true e4m3 subnormal value) modulo hardware flush-to-zero, which only
    affects |x| < 2^-6.  e4m3fn NaN (0xFF) decodes to a finite value — KV
    data is never NaN by construction.  All ops are native i32 VPU ops.
    """
    if tile.dtype == jnp.float8_e4m3fn:
        u = jax.lax.bitcast_convert_type(tile, jnp.uint8).astype(jnp.int32)
        bits = ((u & 0x80) << 24) | ((u & 0x7F) << 20)
        return jax.lax.bitcast_convert_type(bits, jnp.float32) * jnp.float32(
            2.0 ** 120
        )
    return tile.astype(jnp.float32)


def _kernel(
    # scalar prefetch
    tables_ref,  # [B, max_pages] int32 (SMEM)
    positions_ref,  # [B] int32 — position of the query token
    layer_ref,  # [1] int32 — which layer of the pool to read
    # inputs
    q_ref,  # [1, n_kv, group, hd] VMEM block (this sequence)
    k_hbm,  # [n_layers, n_pages, page, n_kv, hd] in HBM (FULL pool: slicing
    #         the layer outside the kernel would materialize a copy of the
    #         slice as the custom-call operand — the layer picks inside)
    v_hbm,
    # output
    out_ref,  # [1, n_kv, group, hd] VMEM block
    # scratch
    k_buf,  # [DEPTH, SUPER*page, n_kv, hd] VMEM
    v_buf,
    sem,  # DMA sems [DEPTH, SUPER, 2]
    *,
    page_size: int,
):
    """Flash decode over SUPER-page superblocks.

    Per-page iteration was instruction-bound: [group, hd] x [hd, page] dots
    and the mask/exp bookkeeping are tiny, so fixed per-op cost dominated.
    A superblock DMAs SUPER pages (individually — page ids are scattered)
    into one contiguous VMEM tile and runs the flash update once per
    SUPER*page tokens: 4x fewer vector ops and 4x larger MXU dots for the
    same HBM traffic.  Tail pages past a sequence's length are neither
    fetched (predicated DMA) nor scored (position mask).
    """
    b = pl.program_id(0)
    q = q_ref[0].astype(jnp.float32)  # [n_kv, group, hd]
    n_kv, group, hd = q.shape

    q_pos = positions_ref[b]
    length = q_pos + 1
    n_pages = pl.cdiv(length, page_size)
    block = SUPER * page_size
    n_blocks = pl.cdiv(length, block)  # traced loop bound

    layer = layer_ref[0]

    def _page_id(j, p):
        # Tail slots past the sequence's last page fetch the reserved scratch
        # page 0 instead: leaving the buffer tail UNWRITTEN would feed
        # uninitialized VMEM (possibly NaN/Inf) into the P.V dot, and
        # 0 * NaN = NaN survives the position mask.  Page 0 only ever holds
        # finite values, and its scores are masked out.
        page_idx = j * SUPER + p
        return jnp.where(page_idx < n_pages, tables_ref[b, page_idx], 0)

    def start_block(slot, j):
        """Launch DMAs for superblock j into buffer `slot`."""
        for p in range(SUPER):
            page_id = _page_id(j, p)
            pltpu.make_async_copy(
                k_hbm.at[layer, page_id],
                k_buf.at[slot, pl.ds(p * page_size, page_size)],
                sem.at[slot, p, 0],
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[layer, page_id],
                v_buf.at[slot, pl.ds(p * page_size, page_size)],
                sem.at[slot, p, 1],
            ).start()

    def wait_block(slot, j):
        for p in range(SUPER):
            page_id = _page_id(j, p)
            pltpu.make_async_copy(
                k_hbm.at[layer, page_id],
                k_buf.at[slot, pl.ds(p * page_size, page_size)],
                sem.at[slot, p, 0],
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[layer, page_id],
                v_buf.at[slot, pl.ds(p * page_size, page_size)],
                sem.at[slot, p, 1],
            ).wait()

    def warm(j, _):
        @pl.when(j < n_blocks)
        def _():
            start_block(j, j)
        return 0

    jax.lax.fori_loop(0, DEPTH, warm, 0)

    scale = 1.0 / (hd ** 0.5)

    def body(j, carry):
        m_prev, l_prev, acc_prev = carry
        slot = jax.lax.rem(j, DEPTH)

        wait_block(slot, j)
        k = _upcast_kv(k_buf[slot])  # [block, n_kv, hd] f32
        v = _upcast_kv(v_buf[slot])

        # reads above materialize into registers; the slot is now free to
        # refill for superblock j + DEPTH
        @pl.when(j + DEPTH < n_blocks)
        def _():
            start_block(slot, j + DEPTH)

        # scores [n_kv, group, block] — per-kv-head matmuls, statically
        # unrolled (Mosaic's tpu.matmul has no batch dims)
        scores = jnp.stack(
            [
                jax.lax.dot_general(
                    q[h],  # [group, hd]
                    k[:, h, :],  # [block, hd]
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in range(n_kv)
            ]
        ) * scale

        token_pos = j * block + jax.lax.broadcasted_iota(
            jnp.int32, (n_kv, group, block), dimension=2
        )
        scores = jnp.where(token_pos <= q_pos, scores, NEG_INF)

        m_cur = jnp.max(scores, axis=-1)  # [n_kv, group]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new[..., None])  # [n_kv, group, block]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        # pv [n_kv, group, hd] — per-kv-head matmuls as above
        pv = jnp.stack(
            [
                jax.lax.dot_general(
                    p[h],  # [group, block]
                    v[:, h, :],  # [block, hd]
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in range(n_kv)
            ]
        )
        acc_new = acc_prev * alpha[..., None] + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((n_kv, group), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((n_kv, group), dtype=jnp.float32)
    acc0 = jnp.zeros((n_kv, group, hd), dtype=jnp.float32)
    _m, l_fin, acc = jax.lax.fori_loop(0, n_blocks, body, (m0, l0, acc0))

    out_ref[0] = (acc / l_fin[..., None]).astype(out_ref.dtype)


def supports(spec, page_size: int) -> bool:
    """Mosaic tiling constraints: the lane dim (head_dim) must be
    128-aligned and pages sublane-aligned."""
    return (
        spec.head_dim % 128 == 0
        and page_size % 8 == 0
        and spec.n_heads % spec.n_kv_heads == 0
    )


@functools.partial(jax.jit, static_argnames=("page_size", "interpret"))
def paged_attention_decode(
    q: jax.Array,  # [B, n_heads, hd] (decode: one query token per sequence)
    k_pages: jax.Array,  # [n_layers, n_pages, page, n_kv, hd] (FULL pool)
    v_pages: jax.Array,
    page_tables: jax.Array,  # [B, max_pages] int32
    positions: jax.Array,  # [B] int32 query positions
    layer: jax.Array,  # scalar int32 — pool layer to attend over
    page_size: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns attention output [B, n_heads, hd] (same dtype as q)."""
    b, n_heads, hd = q.shape
    n_kv = k_pages.shape[3]
    group = n_heads // n_kv
    q4 = q.reshape(b, n_kv, group, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, n_kv, group, hd),
                lambda i, *_: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # K pool stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V pool stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, n_kv, group, hd),
            lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((DEPTH, SUPER * page_size, n_kv, hd), k_pages.dtype),
            pltpu.VMEM((DEPTH, SUPER * page_size, n_kv, hd), v_pages.dtype),
            pltpu.SemaphoreType.DMA((DEPTH, SUPER, 2)),
        ],
    )
    kernel = functools.partial(_kernel, page_size=page_size)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_kv, group, hd), q.dtype),
        interpret=interpret,
    )(
        page_tables,
        positions,
        jnp.asarray(layer, dtype=jnp.int32).reshape(1),
        q4,
        k_pages,
        v_pages,
    )
    return out.reshape(b, n_heads, hd)
