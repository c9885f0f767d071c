"""Paged-attention decode kernel: flash-style attention over KV pages.

Why a kernel: the XLA fallback (kvcache.gather_kv) materializes every
sequence's FULL static page table — [B, max_pages*page_size, n_kv, hd] —
into HBM and reads it back for the einsum, so a decode step pays ~3x the
theoretical KV traffic and pays it for max_seq_len even when sequences are
short.  This kernel instead:

* keeps the page pools in HBM (no blocked in_spec) and DMAs exactly the
  pages a sequence uses — the loop bound is the per-sequence page count,
  a traced value, not the static max;
* pipelines page DMA across the WHOLE batch, not just within one sequence:
  TPU grid steps run sequentially on the core and scratch persists across
  them, so a global prefetch cursor (kept in SMEM) keeps DEPTH superblocks
  in flight even across sequence boundaries.  The round-1 kernel double-
  buffered only within a sequence; at decode contexts (1-3 superblocks per
  sequence) the pipeline drained at every grid step and the op was
  latency-bound at ~4.5x the streamed-bytes floor;
* runs flash-style online softmax (running max / normalizer carried through
  the superblock loop in f32), one grid step per sequence;
* upcasts KV tiles to f32 in VMEM right before use — FP8 page storage
  halves the stream for free (integer-bit-op decode, see _upcast_kv);
* takes a `skip` mask (done / inactive slots): skipped rows clamp to a
  single token of the reserved scratch page, so retired-mid-chunk and empty
  slots cost one superblock instead of their stale full context.

Layout: one grid step per batch row; q [1, n_kv, group, hd] in VMEM; K/V
page tiles [n_kv, page_size, hd] (HEAD-MAJOR, matching the pool layout —
kvcache.py).  GQA runs as per-head [group, hd] x [block, hd] dot_generals
per superblock; each head's block is a CONTIGUOUS VMEM slice (the round-2
page-major layout made per-head slices strided, forcing a whole-tile f32
upcast to dodge Mosaic relayouts).

Page tables, positions and the skip mask arrive via scalar prefetch (SMEM)
so the kernel can compute every DMA source index itself — including the
NEXT grid step's (the cross-sequence prefetch reads tables_ref[b+1] while
sequence b computes).
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
#: env-overridable for tuning sweeps.  3 (192-token blocks) measured best
#: at BOTH the short decode context (384: 2 blocks exact, no tail-page
#: waste — 0.043 vs 0.133 ms/layer at SUPER=4, B=48) and the config-3
#: context (1536: 8 blocks exact — 0.304 vs 0.355), tools/kernel_probe.py.
SUPER = int(os.environ.get("CAESAR_ATTN_SUPER", "3"))
#: superblock buffers in flight (cross-sequence pipeline depth)
DEPTH = int(os.environ.get("CAESAR_ATTN_DEPTH", "4"))
#: TIMING DEBUG ONLY (tools/kernel_probe.py): skip all page DMA and compute
#: over stale VMEM — isolates the flash-math cost from the DMA cost.
#: Results are garbage; never set outside probes.
_NODMA = bool(os.environ.get("CAESAR_ATTN_NODMA"))


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
    skip_ref,  # [B] int32 — nonzero rows clamp to a single scratch token
    # inputs
    q_ref,  # [1, n_kv, group, hd] VMEM block (this sequence)
    k_hbm,  # [n_layers, n_pages, n_kv, page, hd] in HBM (FULL pool: slicing
    #         the layer outside the kernel would materialize a copy of the
    #         slice as the custom-call operand — the layer picks inside)
    v_hbm,
    # output
    out_ref,  # [1, n_kv, group, hd] VMEM block
    # scratch
    k_buf,  # [DEPTH, n_kv, SUPER*page, hd] VMEM
    v_buf,
    sem,  # DMA sems [DEPTH, SUPER, 2]
    cur,  # [4] int32 SMEM, persists across grid steps:
    #       cur[0] = global superblock index of this sequence's first block
    #       cur[1] = prefetch cursor: next sequence to fetch for
    #       cur[2] = prefetch cursor: next superblock within that sequence
    *,
    page_size: int,
):
    """Flash decode over SUPER-page superblocks, pipelined across sequences.

    Per-page iteration was instruction-bound: [group, hd] x [hd, page] dots
    and the mask/exp bookkeeping are tiny, so fixed per-op cost dominated.
    A superblock DMAs SUPER pages (individually — page ids are scattered)
    into one contiguous VMEM tile and runs the flash update once per
    SUPER*page tokens.  Superblocks are consumed in global order
    (sequence-major); the prefetch cursor stays exactly DEPTH superblocks
    ahead, so the slot a consumed block frees (g % DEPTH) is the very slot
    its replacement (g + DEPTH) needs — the DMA stream never drains between
    sequences.  Tail pages past a sequence's length fetch the reserved
    scratch page 0 (never uninitialized VMEM — 0 * NaN = NaN would survive
    the position mask) and are masked out of the scores.
    """
    b = pl.program_id(0)
    n_seqs = tables_ref.shape[0]
    q = q_ref[0].astype(jnp.float32)  # [n_kv, group, hd]
    n_kv, group, hd = q.shape
    block = SUPER * page_size
    layer = layer_ref[0]

    def _length(i):
        # skipped rows attend over exactly one (scratch) token
        i = jnp.minimum(i, n_seqs - 1)  # clamp: callers probe i == n_seqs
        return jnp.where(skip_ref[i] != 0, 1, positions_ref[i] + 1)

    def _n_blocks(i):
        return pl.cdiv(_length(i), block)

    def _page_id(i, j, p):
        n_pages = pl.cdiv(_length(i), page_size)
        page_idx = j * SUPER + p
        i = jnp.minimum(i, n_seqs - 1)
        # clamp: when SUPER doesn't divide the page count the tail probe's
        # page_idx can reach past the table; the where discards the value
        # but the SMEM read itself must stay in bounds
        page_idx_c = jnp.minimum(page_idx, tables_ref.shape[1] - 1)
        return jnp.where(page_idx < n_pages, tables_ref[i, page_idx_c], 0)

    def _copies(i, j, slot, p):
        page_id = _page_id(i, j, p)
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

    def start_block(i, j, slot):
        for p in range(SUPER):
            ck, cv = _copies(i, j, slot, p)
            ck.start()
            cv.start()

    def wait_block(i, j, slot):
        for p in range(SUPER):
            ck, cv = _copies(i, j, slot, p)
            ck.wait()
            cv.wait()

    def _advance(i, j):
        """Next (seq, block) after (i, j) in global order."""
        j = j + 1
        roll = j >= _n_blocks(i)
        return jnp.where(roll, i + 1, i), jnp.where(roll, 0, j)

    # --- warm-up: first grid step fills the pipeline ---------------------
    @pl.when(b == 0 if not _NODMA else b < 0)
    def _():
        def warm(d, pf):
            pf_i, pf_j = pf

            @pl.when(pf_i < n_seqs)
            def _():
                start_block(pf_i, pf_j, d)

            nxt = _advance(pf_i, pf_j)
            return (
                jnp.where(pf_i < n_seqs, nxt[0], pf_i),
                jnp.where(pf_i < n_seqs, nxt[1], pf_j),
            )

        pf = jax.lax.fori_loop(
            0, DEPTH, warm, (jnp.int32(0), jnp.int32(0))
        )
        cur[0] = 0
        cur[1] = pf[0]
        cur[2] = pf[1]

    g_base = cur[0]
    q_pos = jnp.where(skip_ref[b] != 0, 0, positions_ref[b])
    n_blocks = _n_blocks(b)  # traced loop bound
    scale = 1.0 / (hd ** 0.5)

    def consume_block(j):
        """Wait for block j's tiles, refill the freed slot, return (k, v)
        upcast to f32 (one whole-tile VPU op — per-head strided slices of
        raw bf16 tiles measured 8x slower: Mosaic relayouts dominate)."""
        slot = jax.lax.rem(g_base + j, DEPTH)
        if _NODMA:  # timing probe: stale VMEM, no copies (garbage output)
            return _upcast_kv(k_buf[slot]), _upcast_kv(v_buf[slot])
        wait_block(b, j, slot)
        k = _upcast_kv(k_buf[slot])  # [n_kv, block, hd] f32
        v = _upcast_kv(v_buf[slot])

        # reads above materialize into registers; the slot is now free —
        # refill it with the next unprefetched global block (exactly DEPTH
        # ahead of this one, hence the same slot)
        pf_i = cur[1]
        pf_j = cur[2]

        @pl.when(pf_i < n_seqs)
        def _():
            start_block(pf_i, pf_j, slot)

        nxt = _advance(pf_i, pf_j)
        cur[1] = jnp.where(pf_i < n_seqs, nxt[0], pf_i)
        cur[2] = jnp.where(pf_i < n_seqs, nxt[1], pf_j)
        return k, v

    def block_update(k, v, j):
        """Masked scores + flash pieces for block j: returns
        (m [n_kv, group], p [n_kv, group, block], pv [n_kv, group, hd])."""
        scores = jnp.stack(
            [
                jax.lax.dot_general(
                    q[h],  # [group, hd]
                    k[h],  # [block, hd] — contiguous head-major slice
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in range(n_kv)
            ]
        ) * scale
        token_pos = j * block + jax.lax.broadcasted_iota(
            jnp.int32, (n_kv, group, block), dimension=2
        )
        return jnp.where(token_pos <= q_pos, scores, NEG_INF)

    def block_pv(p, v):
        return jnp.stack(
            [
                jax.lax.dot_general(
                    p[h],  # [group, block]
                    v[h],  # [block, hd] — contiguous head-major slice
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for h in range(n_kv)
            ]
        )

    # --- peeled block 0 (every live sequence has one): with m_prev = -inf
    # the alpha-rescale chain is the identity, so the dominant 1-2 block
    # decode contexts pay no carry bookkeeping at all ---------------------
    k, v = consume_block(0)
    scores = block_update(k, v, 0)
    m0 = jnp.max(scores, axis=-1)  # [n_kv, group]
    p = jnp.exp(scores - m0[..., None])
    l0 = jnp.sum(p, axis=-1)
    acc0 = block_pv(p, v)

    def body(j, carry):
        m_prev, l_prev, acc_prev = carry
        k, v = consume_block(j)
        scores = block_update(k, v, j)
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        acc_new = acc_prev * alpha[..., None] + block_pv(p, v)
        return m_new, l_new, acc_new

    _m, l_fin, acc = jax.lax.fori_loop(1, n_blocks, body, (m0, l0, acc0))

    cur[0] = g_base + n_blocks
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
    k_pages: jax.Array,  # [n_layers, n_pages, n_kv, page, hd] (FULL pool)
    v_pages: jax.Array,
    page_tables: jax.Array,  # [B, max_pages] int32
    positions: jax.Array,  # [B] int32 query positions
    layer: jax.Array,  # scalar int32 — pool layer to attend over
    page_size: int,
    skip: jax.Array | None = None,  # [B] bool/int — done/inactive slots
    interpret: bool = False,
) -> jax.Array:
    """Returns attention output [B, n_heads, hd] (same dtype as q).

    Rows with skip set return attention over the single scratch-page token
    (their output is discarded by the caller — done slots emit EOS
    regardless, engine/step.py `emit`)."""
    b, n_heads, hd = q.shape
    n_kv = k_pages.shape[2]
    group = n_heads // n_kv
    q4 = q.reshape(b, n_kv, group, hd)
    if skip is None:
        skip_i = jnp.zeros((b,), jnp.int32)
    else:
        skip_i = skip.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
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
            pltpu.VMEM((DEPTH, n_kv, SUPER * page_size, hd), k_pages.dtype),
            pltpu.VMEM((DEPTH, n_kv, SUPER * page_size, hd), v_pages.dtype),
            pltpu.SemaphoreType.DMA((DEPTH, SUPER, 2)),
            pltpu.SMEM((4,), jnp.int32),
        ],
    )
    kernel = functools.partial(_kernel, page_size=page_size)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_kv, group, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        page_tables,
        positions,
        jnp.asarray(layer, dtype=jnp.int32).reshape(1),
        skip_i,
        q4,
        k_pages,
        v_pages,
    )
    return out.reshape(b, n_heads, hd)
