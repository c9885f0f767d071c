"""Fused dequant+matmul Pallas kernel (INT8 / INT4 weight-only).

The quantized serving engine's hot op (BASELINE.json: "fused INT4/INT8
dequant+matmul Pallas kernels ... at speed-of-light per chip").  Decode is
HBM-bandwidth-bound on weights: streaming int8 (or packed int4) instead of
bf16 halves (quarters) the bytes per step, which is the entire speedup — so
the one job of this kernel is to keep weights quantized across the HBM->VMEM
DMA and dequantize only in VMEM, tile by tile, right before the MXU.

Design (tile sizes and layouts chosen by microbenchmark,
tools/microbench.py, on TPU v5e):

* Grid (N/BN, K/BK) with K innermost; the f32 out tile accumulates across
  K-steps (init at k==0).  Large tiles (512x512 default) so the weight DMA
  is a 256KB stream and Mosaic pipeline overhead vanishes — the first cut
  used group-sized tiles and ran at <100 GB/s; this layout streams int8 at
  ~400 GB/s.
* One scale row per quant group: a BK-row tile spans BK/group groups, so
  dequant is a [BK/group, group, BN]-shaped broadcast multiply.
* INT4 avoids the row-interleave entirely: the activation is pre-split
  outside the kernel into even/odd K columns (x_even, x_odd — tiny [M, K/2]
  slices), and each packed byte tile contributes two MXU dots
  (x_even @ dequant(lo) + x_odd @ dequant(hi)).  The stack/reshape
  interleave of the naive unpack was VPU-bound at ~36 GB/s; the split-stream
  form keeps the MXU fed.  Nibble shifts run in i32 (Mosaic has no i8
  vector shifts).
* The N grid axis is marked "parallel" (K "arbitrary") so Mosaic can
  software-pipeline across output tiles.

Falls back to the XLA dequant+dot path (quant.py) for shapes that do not
tile evenly; runs in interpreter mode off-TPU so CPU tests execute the same
kernel logic.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_ALIGN = 8
#: VMEM budget for one program's working set (double-buffered weight tile +
#: activations + f32 out tile); v5e has 16 MB — the rest is left for
#: Mosaic's own pipelining of the other operands.  Env-overridable for
#: tuning sweeps (tools/kernel_probe.py).
import os as _os

_VMEM_BUDGET = int(
    float(_os.environ.get("CAESAR_QMM_VMEM_MB", "10")) * 1024 * 1024
)


def _divisors_mult(dim: int, mult: int, cap: int) -> Tuple[int, ...]:
    """Divisors of dim that are multiples of `mult`, up to `cap`."""
    return tuple(
        d for d in range(mult, min(dim, cap) + 1, mult) if dim % d == 0
    )


@functools.lru_cache(maxsize=None)
def _pick_tiles_w8a8(
    m: int, k: int, n: int, group: int, w_bytes_per_el: int = 1
) -> Optional[Tuple[int, int]]:
    """(bk, bn) maximizing weight-tile bytes under the VMEM budget.

    The w8a8 kernel is DMA-bound per byte but pays a fixed ~0.5 us per grid
    step, so throughput = tile_bytes / max(tile_dma_time, step_cost):
    maximizing bytes per step (equivalently minimizing grid steps) is the
    whole tuning story.  bk may span the ENTIRE reduction dim (no
    accumulation loop at all) when it fits.

    Per-column scales (group == k): bk need NOT be a multiple of the group —
    the per-column kernel accumulates raw int32 across K-tiles and rescales
    once at the last one, so any divisor of k works.  This is what keeps the
    7B down projection (k=18944, whose only group-multiple tile is the whole
    18944 x bn slab) on the kernel path instead of the XLA fallback.
    """
    def fits(bk, bn):
        groups_per_tile = max(bk // group, 1)
        vmem = (
            2 * bk * bn * w_bytes_per_el  # double-buffered weight tile
            + 2 * m * bk  # int8 activations (double-buffered)
            + m * bn * 4  # f32 out tile
            + m * bn * 4  # int32 accumulator scratch (per-column kernel)
            + 2 * groups_per_tile * bn * 2  # scales
        )
        return vmem <= _VMEM_BUDGET

    bk_step = group if group < k else 128  # per-column: any 128-multiple
    forced_bn = int(_os.environ.get("CAESAR_QMM_BN", "0"))
    if forced_bn and n % forced_bn == 0:
        for bk in sorted(_divisors_mult(k, bk_step, 32768), reverse=True):
            if fits(bk, forced_bn):
                return (bk, forced_bn)
    best = None
    best_key = None
    for bn in _divisors_mult(n, 128, 8192):
        for bk in _divisors_mult(k, bk_step, 32768):
            if not fits(bk, bn):
                continue
            key = (bk * bn, bk)  # max tile bytes, tie-break deeper K
            if best_key is None or key > best_key:
                best_key = key
                best = (bk, bn)
    return best


def _apply_scales(w: jax.Array, s_ref) -> jax.Array:
    """[BK', BN] bf16 tile * per-group scales [groups, 1, BN]."""
    groups_per_tile = s_ref.shape[0]
    bk, bn = w.shape
    group = bk // groups_per_tile
    w = w.reshape(groups_per_tile, group, bn) * s_ref[:].astype(jnp.bfloat16)
    return w.reshape(bk, bn)


def _int8_kernel(x_ref, qw_ref, s_ref, out_ref):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = _apply_scales(qw_ref[:].astype(jnp.bfloat16), s_ref)
    out_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)


def _make_int4_kernel(compute_dtype):
    """Split-stream int4: lo nibbles pair with even K columns of x, hi with
    odd.  compute_dtype is bf16 on TPU; f32 in interpreter mode (the XLA CPU
    executor lacks some bf16 dot thunks)."""

    def kernel(xe_ref, xo_ref, qw_ref, se_ref, so_ref, out_ref):
        k_idx = pl.program_id(1)

        @pl.when(k_idx == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        u = qw_ref[:].astype(jnp.int32) & 0xFF  # [BK/2, BN]
        lo = u & 0x0F
        hi = (u >> 4) & 0x0F
        lo = jnp.where(lo >= 8, lo - 16, lo).astype(compute_dtype)
        hi = jnp.where(hi >= 8, hi - 16, hi).astype(compute_dtype)
        w_lo = _apply_scales(lo, se_ref).astype(compute_dtype)
        w_hi = _apply_scales(hi, so_ref).astype(compute_dtype)
        acc = jnp.dot(
            xe_ref[:].astype(compute_dtype), w_lo,
            preferred_element_type=jnp.float32,
        )
        acc += jnp.dot(
            xo_ref[:].astype(compute_dtype), w_hi,
            preferred_element_type=jnp.float32,
        )
        out_ref[:] += acc

    return kernel


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
    )


def _w8a8_kernel(xq_ref, qw_ref, s_ref, out_ref):
    """Native int8 MXU matmul with per-group output rescale.

    The weight-only kernel (_int8_kernel) is VPU-bound: every weight byte
    pays an int8->bf16 cast plus a scale multiply before the MXU sees it,
    capping it near half of HBM bandwidth.  Here the MXU consumes the int8
    tile directly (int8 x int8 -> int32) and the only VPU work is the
    [M, BN] per-group rescale by the weight scale — M/group (= 32/128) ops
    per weight byte, so the kernel is DMA-bound.  The per-token activation
    scale is applied by the caller on the [M, N] output (a column broadcast
    Mosaic's lane layout can't index efficiently in the inner loop).

    xq  [M, BK] int8           — pre-quantized activations (per-token)
    qw  [BK, BN] int8          — weight tile
    s   [BK/group, 1, BN] bf16 — weight group scales
    """

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    groups = s_ref.shape[0]
    group = qw_ref.shape[0] // groups
    acc = jnp.zeros_like(out_ref)
    for g in range(groups):  # static unroll (BK/group is small)
        ig = jnp.dot(
            xq_ref[:, g * group : (g + 1) * group],
            qw_ref[g * group : (g + 1) * group, :],
            preferred_element_type=jnp.int32,
        )
        ws_row = s_ref[g, 0, :].astype(jnp.float32)[None, :]  # [1, BN]
        acc += ig.astype(jnp.float32) * ws_row
    out_ref[:] += acc


@functools.lru_cache(maxsize=None)
def _pick_tiles_w4a8(
    m: int, k: int, n: int, group: int
) -> Optional[Tuple[int, int]]:
    """(bk, bnp) for the w4a8 kernel: bnp tiles the PACKED column dim n//2.

    VMEM working set: double-buffered packed tile + the unpacked lo/hi
    int8 planes + activations + the [2, m, bnp] f32 out tile."""
    half = n // 2

    def fits(bk, bnp):
        vmem = (
            2 * bk * bnp  # packed bytes, double-buffered
            + 2 * bk * bnp  # lo + hi unpacked planes
            + 2 * m * bk  # int8 activations
            + 2 * 2 * m * bnp * 4  # out tile (+ percol int32 scratch)
            + 4 * max(bk // group, 1) * bnp  # planar scales
        )
        return vmem <= _VMEM_BUDGET

    bk_step = group if group < k else 128
    best, best_key = None, None
    for bnp in _divisors_mult(half, 128, 8192):
        for bk in _divisors_mult(k, bk_step, 32768):
            if not fits(bk, bnp):
                continue
            key = (bk * bnp, bk)
            if best_key is None or key > best_key:
                best_key, best = key, (bk, bnp)
    return best


def _unpack_biased(qw_ref):
    """Packed biased nibbles [bk, bnp] -> (lo, hi) int8 planes, 0..15.

    The entire per-byte VPU cost of w4a8: one mask and one shift (the +8
    bias removed the sign-extension compare/select chain; its correction
    is linear and rides the rs_ref group rowsums)."""
    u = qw_ref[:].astype(jnp.int32) & 0xFF
    lo = (u & 0x0F).astype(jnp.int8)
    hi = (u >> 4).astype(jnp.int8)
    return lo, hi


def _w4a8_kernel(xq_ref, qw_ref, s_ref, out_ref):
    """Grouped w4a8: per-group int8 MXU dots on biased nibble planes.

    xq  [M, BK] int8            — per-token quantized activations
    qw  [BK, BNP] int8          — column-planar packed bytes
    s   [BK/group, 2, BNP] bf16 — planar weight scales (lo, hi planes)
    out [2, M, BNP] f32         — planar output (caller unpermutes)

    The +8 nibble-bias correction (dot(x, w+8) - 8*sum(x)) is computed
    IN-KERNEL from the resident xq tile — an [M, group] VPU reduction per
    group, exact in f32 (|group sum| <= 128*127 < 2^24).  A separate
    rowsum operand would need an [M, groups_per_tile] block whose last
    dim is neither 128-aligned nor the full array dim — a Mosaic block
    constraint the interpret-mode tests don't enforce but the TPU
    lowering rejects (round-4 w4a8 bench crash).
    """

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    lo, hi = _unpack_biased(qw_ref)
    groups = s_ref.shape[0]
    group = qw_ref.shape[0] // groups
    acc_lo = jnp.zeros_like(out_ref[0])
    acc_hi = jnp.zeros_like(out_ref[0])
    for g in range(groups):  # static unroll (BK/group is small)
        sl = pl.ds(g * group, group)
        xg = xq_ref[:, sl]
        ig_lo = jnp.dot(xg, lo[g * group:(g + 1) * group],
                        preferred_element_type=jnp.int32)
        ig_hi = jnp.dot(xg, hi[g * group:(g + 1) * group],
                        preferred_element_type=jnp.int32)
        rsg = 8.0 * jnp.sum(
            xg.astype(jnp.float32), axis=1, keepdims=True
        )  # [M, 1]
        slo = s_ref[g, 0, :].astype(jnp.float32)[None, :]
        shi = s_ref[g, 1, :].astype(jnp.float32)[None, :]
        acc_lo += (ig_lo.astype(jnp.float32) - rsg) * slo
        acc_hi += (ig_hi.astype(jnp.float32) - rsg) * shi
    out_ref[0] += acc_lo
    out_ref[1] += acc_hi


def _w4a8_percol_kernel(
    xq_ref, rs_ref, qw_ref, s_ref, out_ref, alo_ref, ahi_ref
):
    """Per-column-scale w4a8: raw int32 accumulation across K tiles (exact:
    K * 127 * 15 < 2^31 for every supported K), one rescale at the end."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        alo_ref[:] = jnp.zeros_like(alo_ref)
        ahi_ref[:] = jnp.zeros_like(ahi_ref)

    lo, hi = _unpack_biased(qw_ref)
    alo_ref[:] += jnp.dot(xq_ref[:], lo, preferred_element_type=jnp.int32)
    ahi_ref[:] += jnp.dot(xq_ref[:], hi, preferred_element_type=jnp.int32)

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _():
        rs = rs_ref[:, 0][:, None]  # [M, 1] f32: 8 * full-K rowsum
        slo = s_ref[0, 0, :].astype(jnp.float32)[None, :]
        shi = s_ref[0, 1, :].astype(jnp.float32)[None, :]
        out_ref[0] = (alo_ref[:].astype(jnp.float32) - rs) * slo
        out_ref[1] = (ahi_ref[:].astype(jnp.float32) - rs) * shi


@functools.partial(
    jax.jit,
    static_argnames=("group", "k", "n", "bk", "bnp", "interpret"),
)
def _w4a8_matmul(xq, rs, qweight, scales, group, k, n, bk, bnp, interpret):
    """rs is consumed by the PER-COLUMN kernel only (8 * full-K rowsum,
    [M, 1]); the grouped kernel computes its per-group rowsums in-kernel
    and takes no rs operand (see _w4a8_kernel)."""
    m = xq.shape[0]
    half = n // 2
    grid = (half // bnp, k // bk)
    percol = group >= k
    groups_per_tile = 1 if percol else bk // group
    flops = 2 * m * n * k
    bytes_accessed = qweight.size + scales.size * 2 + m * k + m * n * 4
    xq_spec = pl.BlockSpec(
        (m, bk), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )
    qw_spec = pl.BlockSpec(
        (bk, bnp), lambda i, j: (j, i), memory_space=pltpu.VMEM
    )
    s_spec = pl.BlockSpec(
        (groups_per_tile, 2, bnp),
        (lambda i, j: (0, 0, i)) if percol else (lambda i, j: (j, 0, i)),
        memory_space=pltpu.VMEM,
    )
    if percol:
        in_specs = [
            xq_spec,
            pl.BlockSpec(
                (m, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            qw_spec,
            s_spec,
        ]
        operands = (xq, rs, qweight, scales)
    else:
        in_specs = [xq_spec, qw_spec, s_spec]
        operands = (xq, qweight, scales)
    return pl.pallas_call(
        _w4a8_percol_kernel if percol else _w4a8_kernel,
        out_shape=jax.ShapeDtypeStruct((2, m, half), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (2, m, bnp), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=(
            [
                pltpu.VMEM((m, bnp), jnp.int32),
                pltpu.VMEM((m, bnp), jnp.int32),
            ]
            if percol
            else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(*operands)


def _w8a8_percol_kernel(xq_ref, qw_ref, s_ref, out_ref, acc_ref):
    """Per-column-scale variant: the scale has no K dependence, so K-tiles
    accumulate RAW int32 partial sums in scratch (exact: K * 127^2 < 2^31
    for every supported K) and the single per-column rescale happens once,
    at the last K step.  This frees bk from the bk % group == 0 constraint
    — any VMEM-fitting divisor of K tiles the reduction."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        xq_ref[:], qw_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _():
        ws_row = s_ref[0, 0, :].astype(jnp.float32)[None, :]  # [1, BN]
        out_ref[:] = acc_ref[:].astype(jnp.float32) * ws_row


def _w8a8_percol_fused_kernel(xq_ref, xs_ref, qw_ref, s_ref, out_ref, acc_ref):
    """Per-column kernel with the per-token activation rescale fused into
    the epilogue and a bf16 output tile.

    Numerically identical to _w8a8_percol_kernel + the caller's
    `out * xs[:, None]` + linear()'s bf16 cast — same f32 op order
    ((acc * ws) * xs, then one rounding) — but the [M, N] intermediate
    leaves the kernel as bf16: halves the fattest non-weight HBM stream of
    the decode step (gate_up's [48, 37888] f32 write + re-read was ~20 us
    of the measured ~43 us/layer mlp glue, docs/ENGINE.md round-5 audit).
    The [M, 1] xs column broadcast happens ONCE here, not per K-tile —
    the lane-layout cost that kept it out of the grouped kernels' inner
    loop doesn't apply to a single epilogue."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        xq_ref[:], qw_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k_idx == pl.num_programs(1) - 1)
    def _():
        ws_row = s_ref[0, 0, :].astype(jnp.float32)[None, :]  # [1, BN]
        xs_col = xs_ref[:, 0][:, None]  # [M, 1]
        out_ref[:] = (
            acc_ref[:].astype(jnp.float32) * ws_row * xs_col
        ).astype(jnp.bfloat16)


@functools.partial(
    jax.jit,
    static_argnames=("group", "k", "n", "bk", "bn", "interpret"),
)
def _w8a8_matmul_fused(xq, xs, qweight, scales, group, k, n, bk, bn,
                       interpret):
    """Per-column-only variant of _w8a8_matmul: fused xs epilogue, bf16 out."""
    m = xq.shape[0]
    grid = (n // bn, k // bk)
    flops = 2 * m * n * k
    bytes_accessed = qweight.size + scales.size * 2 + m * k + m * n * 2
    return pl.pallas_call(
        _w8a8_percol_fused_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, bn), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xq, xs.reshape(m, 1), qweight, scales.reshape(-1, 1, n))


@functools.partial(
    jax.jit,
    static_argnames=("group", "k", "n", "bk", "bn", "interpret"),
)
def _w8a8_matmul(xq, qweight, scales, group, k, n, bk, bn, interpret):
    m = xq.shape[0]
    grid = (n // bn, k // bk)
    flops = 2 * m * n * k
    bytes_accessed = qweight.size + scales.size * 2 + m * k + m * n * 4
    percol = group >= k  # one scale row spanning the whole reduction
    groups_per_tile = 1 if percol else bk // group
    return pl.pallas_call(
        _w8a8_percol_kernel if percol else _w8a8_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (groups_per_tile, 1, bn),
                (lambda i, j: (0, 0, i)) if percol
                else (lambda i, j: (j, 0, i)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        scratch_shapes=(
            [pltpu.VMEM((m, bn), jnp.int32)] if percol else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(xq, qweight, scales.reshape(-1, 1, n))


@functools.partial(
    jax.jit,
    static_argnames=("group", "k", "n", "bk", "bn", "interpret"),
)
def _int8_matmul(x, qweight, scales, group, k, n, bk, bn, interpret):
    m = x.shape[0]
    grid = (n // bn, k // bk)
    flops = 2 * m * n * k
    bytes_accessed = qweight.size + scales.size * 2 + m * k * 2 + m * n * 4
    return pl.pallas_call(
        _int8_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bk // group, 1, bn),
                lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x, qweight, scales.reshape(-1, 1, n))


@functools.partial(
    jax.jit,
    static_argnames=("group", "k", "n", "bk", "bn", "interpret"),
)
def _int4_matmul(x, qweight, scales, group, k, n, bk, bn, interpret):
    m = x.shape[0]
    grid = (n // bn, k // bk)
    # split activations into the streams matching lo (even K) / odd nibbles
    x_even = x[:, 0::2]  # [M, K/2]
    x_odd = x[:, 1::2]
    # scales of original rows 2r / 2r+1: both nibbles share the group, so
    # even/odd scale streams are the SAME rows — pass the one table twice
    # with half-group tiles (group/2 packed rows per group)
    s3 = scales.reshape(-1, 1, n)
    flops = 2 * m * n * k
    bytes_accessed = qweight.size + scales.size * 2 + m * k * 2 + m * n * 4
    kernel = _make_int4_kernel(jnp.float32 if interpret else jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (m, bk // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (m, bk // 2), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bk // 2, bn), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (bk // group, 1, bn),
                lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bk // group, 1, bn),
                lambda i, j: (j, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x_even, x_odd, qweight, s3, s3)


def _local_dims(w) -> Tuple[int, int, int]:
    """(k, n, group) from the ARRAY shapes, not the metadata — inside
    shard_map the leaves are per-shard slices while in/out_features stay
    global, so shapes are the single source of truth."""
    if w.w4a8:  # column-planar packing (quant.QuantizedLinear.w4a8)
        k = w.qweight.shape[0]
        n = w.qweight.shape[1] * 2
    else:
        k = w.qweight.shape[0] * (2 if w.bits == 4 else 1)
        n = w.qweight.shape[1]
    group = k // w.scales.shape[0]
    return k, n, group


def _tiles_for(w) -> Optional[Tuple[int, int]]:
    """(bk, bn) for the weight-only kernels, by divisor search.

    The original fixed candidate lists (1024/768/512/256 x 512/256/128)
    missed real TP shard shapes — at 32B tp=8 the local gate/up n=3456 has
    no candidate divisor, silently sending the whole MLP to the XLA
    bf16-dequant fallback whose f32 temps OOM'd the config-4 AOT compile
    (64 layers x 67.5 MB).  Enumerate actual divisors instead, largest
    first, same caps."""
    k, n, group = _local_dims(w)
    bns = _divisors_mult(n, 128, 1024)
    bn = max(bns) if bns else None
    bks = list(_divisors_mult(k, group, 512)) if k % group == 0 else []
    if w.bits == 4 and not w.w4a8:
        # packed int4 lane legality: the x_even/x_odd and packed-weight
        # blocks have a [.., bk//2] minor dim, which Mosaic requires to be
        # 128-divisible OR equal to the full array dim.  Row-sharded TP
        # slices (e.g. wo at tp=8: local k=640 -> bk//2=64) hit this;
        # fall back to bk=k (block == array is always legal) when the
        # whole packed reduction fits VMEM.  Caught by the config-4 AOT
        # probe — CPU interpret mode never checks block shapes.
        bks = [d for d in bks if (d // 2) % 128 == 0]
        if not bks and k % group == 0 and bn and k * bn // 2 <= 2 ** 21:
            bks = [k]
    bk = max(bks) if bks else None
    if bn is None or bk is None:
        return None
    return bk, bn


def supports(w) -> bool:
    """Whether the kernel tiles this QuantizedLinear evenly."""
    k, _, group = _local_dims(w)
    return k % group == 0 and _tiles_for(w) is not None


#: token threshold above which matmuls leave the Pallas kernels for plain
#: XLA dots.  The kernels are DECODE-tuned: they hold the whole [M, K]
#: activation block in VMEM and maximize weight-tile bytes, which is right
#: when M is the ~48-row decode batch and the op is weight-DMA-bound.  At
#: prefill M (hundreds to thousands of tokens) that same tile search
#: collapses to tiny tiles and re-streams the activations once per N-tile —
#: measured ~15x off the compute roofline at config-3 shape (the round-3
#: prefill bottleneck).  Prefill is COMPUTE-bound: XLA's native int8 MXU
#: dot measured ~280 TFLOPs at [2048, 3584] x [3584, 37888], so above this
#: M the right kernel is no kernel at all.
_XLA_M = int(_os.environ.get("CAESAR_QMM_XLA_M", "256"))


def _w4a8_grouped_call(x2, w, tp_axis, interpret):
    """One w4a8 Pallas dispatch on a [M, K] bf16 slab -> [M, N] f32.

    Shared by the decode path (quant_matmul_pallas, M < _XLA_M) and the
    M-chunked prefill path (_large_m_matmul).  Column-planar biased packing
    (quant.quantize_weight) -> per-group int8 MXU dots; per-group bias
    correction from activation rowsums; output unpermuted from (lo, hi)
    planes to true columns.  Returns None when the tile search cannot tile
    the shape (tiny test models / shard slices)."""
    from caesar_tpu.engine.quant import quantize_activations

    k, n, group = _local_dims(w)
    m = x2.shape[0]
    m_pad = -m % 32  # int8 min sublane tile
    tiles4 = (
        _pick_tiles_w4a8(m + m_pad, k, n, group)
        if k % group == 0
        else None
    )
    if tiles4 is None:
        return None
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    bk, bnp = tiles4
    xq, xs = quantize_activations(x2, tp_axis)
    # rs feeds the PER-COLUMN kernel only (8 * full-K rowsum);
    # the grouped kernel derives its per-group rowsums in-kernel
    if group >= k:
        rs = 8.0 * jnp.sum(xq.astype(jnp.float32), axis=1, keepdims=True)
    else:
        rs = jnp.zeros((x2.shape[0], 1), jnp.float32)
    out_pl = _w4a8_matmul(
        xq, rs, w.qweight, w.scales, group, k, n, bk, bnp, interpret
    )  # [2, M, n//2] planar
    out_pl = out_pl * xs[None, :, None]
    half = n // 2
    out = (
        out_pl.reshape(2, x2.shape[0], half // 32, 32)
        .transpose(1, 2, 0, 3)
        .reshape(x2.shape[0], n)
    )
    if m_pad:
        out = out[:m]
    return out


#: row-chunk size for the grouped-w4a8 prefill path (_large_m_matmul):
#: the largest M at which _pick_tiles_w4a8 still finds big weight tiles
#: (the [M, BK] activation block and [2, M, BNP] out tile live in VMEM).
_W4A8_M_CHUNK = int(_os.environ.get("CAESAR_W4A8_M_CHUNK", "256"))


def _large_m_matmul(x2: jax.Array, w, tp_axis=None) -> jax.Array:
    """Compute-bound (prefill-shape) path: plain XLA dots on the MXU.

    Per-column-scale int8 activations (the serving default for BOTH w8a8
    and w4a8, weights.resolve_quant_group): one native int8 x int8 -> int32
    dot — bit-identical to the Pallas per-column kernels (same raw int32
    accumulation, same two f32 rescales), so prefill logits and decode
    logits share one numeric path.  Grouped w4a8 (the w4a8 serving
    default): the decode-tuned grouped Pallas kernel, M-chunked — see
    below.  Other grouped / weight-only modes: dequantize once to bf16
    and let the MXU stream it — at M >= _XLA_M the dequant traffic is
    amortized over enough rows that the dot is compute-bound either way.

    NUMERIC-DIVERGENCE NOTE (round-4 advisor): for GROUPED modes this
    bf16-dequant path computes different numerics than the decode-tuned
    int8 kernels for the same weights; the last prefill logits seed the
    first sampled token, so greedy ties can in principle flip at the
    M >= _XLA_M boundary.  The serving defaults (per-column) are immune;
    grouped runs accept the documented boundary.  A decode batch can never
    reach _XLA_M rows (max_batch caps well below 256).
    """
    from caesar_tpu.engine.quant import (
        _unpack_int4,
        _unpack_w4a8,
        _unplanarize_scales,
        dequantize,
        quantize_activations,
        rank1_factors,
    )

    k, n, group = _local_dims(w)
    if w.w4a8 and group < k and not w.rank1:
        # Grouped w4a8 (the w4a8 serving default, resolve_quant_group):
        # run the decode-tuned grouped Pallas kernel over M-chunks instead
        # of dequantizing to bf16.  The kernel holds the whole [M, BK]
        # activation block and [2, M, BNP] out tile in VMEM, so its tile
        # search collapses at prefill M — chunking M restores decode-sized
        # tiles.  Weights re-stream once per chunk (M/256 times), but at
        # M >= _XLA_M the op is MXU-compute-bound and the re-stream rides
        # under the dots; the int8 MXU path is ~2x the bf16-dequant dot
        # this branch used to take (round-4's 2x w4a8 prefill gap).
        interpret = jax.default_backend() != "tpu"
        m2 = x2.shape[0]
        outs = []
        for i in range(0, m2, _W4A8_M_CHUNK):
            out = _w4a8_grouped_call(
                x2[i : i + _W4A8_M_CHUNK], w, tp_axis, interpret
            )
            if out is None:  # tile search failed (tiny shard shapes)
                outs = None
                break
            outs.append(out)
        if outs is not None:
            return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
    if w.w4a8 and w.rank1 and group < k:
        # rank-1 grouped w4a8 (the serving default): fold the row factor
        # into the activations BEFORE per-token quantization, then ONE
        # native full-K int8 dot rescaled by col * xs — grouped-scale
        # fidelity at the per-column path's prefill speed (decode keeps
        # the grouped Pallas kernel on the stored product scales).
        row, col = rank1_factors(w)
        m2 = x2.shape[0]
        xg = (
            x2.astype(jnp.float32).reshape(m2, k // group, group)
            * row[None, :, None]
        ).reshape(m2, k)
        xq, xs = quantize_activations(xg, tp_axis)
        qw = _unpack_w4a8(w.qweight)
        ig = jax.lax.dot_general(
            xq, qw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return ig.astype(jnp.float32) * col[None, :] * xs[:, None]
    if w.act == "int8" and group >= k:
        xq, xs = quantize_activations(x2, tp_axis)
        if w.w4a8:
            qw = _unpack_w4a8(w.qweight)
            scales = _unplanarize_scales(w.scales)
        elif w.bits == 4:
            qw = _unpack_int4(w.qweight, k)
            scales = w.scales
        else:
            qw = w.qweight
            scales = w.scales
        ig = jax.lax.dot_general(
            xq, qw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            ig.astype(jnp.float32)
            * scales.reshape(1, n).astype(jnp.float32)
            * xs[:, None]
        )
    wf = dequantize(w, dtype=jnp.bfloat16)
    return jnp.dot(x2, wf, preferred_element_type=jnp.float32)


def quant_matmul_pallas(x: jax.Array, w, tp_axis=None, out_dtype=None
                        ) -> jax.Array:
    """x [..., K] @ dequant(w) -> [..., N] f32 via the fused kernel.

    tp_axis: mesh axis name when called on a row-parallel shard inside
    shard_map — the w8a8 activation scale is pmax'd over it so every shard
    quantizes with the global per-token scale (exact single-device parity).

    out_dtype=bf16 (bias-free call sites, see model.linear): per-column
    w8a8 at decode M emits bf16 straight from the kernel with the
    per-token rescale fused into the epilogue — bit-identical to the f32
    path + rescale + cast, half the [M, N] HBM traffic.  Other modes
    ignore the hint (the caller's astype lands in the same place).
    """
    from caesar_tpu.engine.quant import dequantize, quantize_activations

    k, n, group = _local_dims(w)
    leading = x.shape[:-1]
    interpret = jax.default_backend() != "tpu"

    m_total = 1
    for d in leading:
        m_total *= d
    if m_total >= _XLA_M:
        out = _large_m_matmul(
            x.reshape(-1, k).astype(jnp.bfloat16), w, tp_axis
        )
        return out.reshape(*leading, n)

    if w.act == "int8" and w.bits == 4:
        if not w.w4a8:  # tiny non-planar shapes: XLA reference path
            wf = dequantize(w, dtype=jnp.bfloat16)
            return jnp.dot(x, wf, preferred_element_type=jnp.float32)
        # w4a8 kernel dispatch (shared with the M-chunked prefill path)
        x2 = x.reshape(-1, k).astype(jnp.bfloat16)
        out = _w4a8_grouped_call(x2, w, tp_axis, interpret)
        if out is not None:
            return out.reshape(*leading, n)
        # shapes the kernel cannot tile (tiny test models): XLA reference
        wf = dequantize(w, dtype=jnp.bfloat16)
        return jnp.dot(x, wf, preferred_element_type=jnp.float32)

    if w.act == "int8" and w.bits == 8 and k % group == 0:
        # w8a8 picks tiles with its own search (per-column scales free bk
        # from the group-multiple constraint _tiles_for imposes — gating on
        # _tiles_for here silently sent the per-column serving default to
        # the XLA fallback, the round-2 VERDICT's #1 perf gap)
        x2 = x.reshape(-1, k).astype(jnp.bfloat16)
        m = x2.shape[0]
        m_pad = -m % 32  # int8 min sublane tile is 32
        tiles8 = _pick_tiles_w8a8(m + m_pad, k, n, group)
        if tiles8 is not None:
            if m_pad:
                x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
            bk, bn = tiles8
            xq, xs = quantize_activations(x2, tp_axis)
            fused = (
                group >= k
                and out_dtype == jnp.bfloat16
                and not _os.environ.get("CAESAR_QMM_F32_OUT")
            )
            if fused:
                out = _w8a8_matmul_fused(
                    xq, xs, w.qweight, w.scales, group, k, n, bk, bn,
                    interpret,
                )
            else:
                out = _w8a8_matmul(
                    xq, w.qweight, w.scales, group, k, n, bk, bn, interpret
                )
                out = out * xs[:, None]  # per-token rescale (fused by XLA)
            if m_pad:
                out = out[:m]
            return out.reshape(*leading, n)

    tiles = _tiles_for(w) if k % group == 0 else None
    if tiles is None:
        wf = dequantize(w, dtype=jnp.bfloat16)
        return jnp.dot(x, wf, preferred_element_type=jnp.float32)
    bk, bn = tiles

    x2 = x.reshape(-1, k).astype(jnp.bfloat16)
    m = x2.shape[0]
    m_pad = -m % M_ALIGN
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    fn = _int8_matmul if w.bits == 8 else _int4_matmul
    out = fn(x2, w.qweight, w.scales, group, k, n, bk, bn, interpret)
    if m_pad:
        out = out[:m]
    return out.reshape(*leading, n)
