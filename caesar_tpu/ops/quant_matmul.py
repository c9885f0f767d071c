"""Fused dequant+matmul Pallas kernel (INT8 / INT4 weight-only).

The quantized serving engine's hot op (BASELINE.json: "fused INT4/INT8
dequant+matmul Pallas kernels ... at speed-of-light per chip").  Decode is
HBM-bandwidth-bound on weights: streaming int8 (or packed int4) instead of
bf16 halves (quarters) the bytes per step, which is the entire speedup — so
the one job of this kernel is to keep weights quantized across the HBM->VMEM
DMA and dequantize only in VMEM, tile by tile, right before the MXU.

Design:

* Grid (N/BN, K/BK) with K innermost; the f32 out tile accumulates across
  K-steps (init at k==0).  Block sizes: BK = quant group size (one scale row
  per K-tile, so dequant is a single broadcast multiply), BN = 256 lanes.
* x tile [M, BK] stays resident across the N loop (index map ignores n);
  M is the (padded) token batch — small for decode, prefill_chunk for
  prefill.
* INT8: w_tile = int8 [BK, BN] -> bf16 * scale -> MXU dot at bf16 with f32
  accumulation.
* INT4: the packed [BK/2, BN] byte tile unpacks with shift/mask into the
  even/odd rows of a [BK, BN] tile.  Packing interleaved rows along K (see
  quant.py) keeps both nibbles of a byte in the same group, so one scale
  broadcast still covers the whole tile.

Falls back to the XLA dequant+dot path (quant.py) for shapes that do not
tile evenly; runs in interpreter mode off-TPU so CPU tests execute the same
kernel logic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 256  # output-lane tile
M_ALIGN = 8


def _int8_kernel(x_ref, qw_ref, s_ref, out_ref):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = qw_ref[:].astype(jnp.bfloat16) * s_ref[0].astype(jnp.bfloat16)
    out_ref[:] += jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    )


def _int4_kernel(x_ref, qw_ref, s_ref, out_ref):
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    packed = qw_ref[:]  # [BK//2, BN] int8, two nibbles per byte
    # Mosaic has no i8 vector shifts — unpack in i32 (sign-extend, mask to
    # the raw byte, then split nibbles)
    u = packed.astype(jnp.int32) & 0xFF
    lo = u & 0x0F
    hi = (u >> 4) & 0x0F
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.bfloat16)
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.bfloat16)
    # interleave rows: packed row r holds original rows 2r (lo) and 2r+1 (hi)
    half, bn = lo.shape
    w = jnp.stack([lo, hi], axis=1).reshape(half * 2, bn)
    w = w * s_ref[0].astype(jnp.bfloat16)
    out_ref[:] += jnp.dot(
        x_ref[:], w, preferred_element_type=jnp.float32
    )


@functools.partial(
    jax.jit, static_argnames=("bits", "group", "k", "n", "interpret")
)
def _quant_matmul_2d(
    x: jax.Array,  # [M, K] bf16 (M already aligned)
    qweight: jax.Array,
    scales: jax.Array,
    bits: int,
    group: int,
    k: int,
    n: int,
    interpret: bool,
) -> jax.Array:
    m = x.shape[0]
    bk = group
    grid = (n // BN, k // bk)
    kernel = _int8_kernel if bits == 8 else _int4_kernel
    qw_rows = bk if bits == 8 else bk // 2

    flops = 2 * m * n * k
    bytes_accessed = (
        qweight.size + scales.size * 2 + m * k * 2 + m * n * 4
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m, bk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (qw_rows, BN), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
            # scales as [n_groups, 1, N] so the (1, BN) tile satisfies
            # Mosaic's last-two-dims tiling rule via the singleton axis
            pl.BlockSpec(
                (1, 1, BN), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, BN), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x, qweight, scales.reshape(-1, 1, n))


def supports(w) -> bool:
    """Whether the kernel tiles this QuantizedLinear evenly."""
    return (
        w.out_features % BN == 0
        and w.in_features % w.group == 0
        and (w.bits == 8 or w.group % 2 == 0)
    )


def quant_matmul_pallas(x: jax.Array, w) -> jax.Array:
    """x [..., K] @ dequant(w) -> [..., N] f32 via the fused kernel."""
    from caesar_tpu.engine.quant import dequantize

    if not supports(w):
        wf = dequantize(w, dtype=jnp.bfloat16)
        return jnp.dot(x, wf, preferred_element_type=jnp.float32)

    leading = x.shape[:-1]
    k = w.in_features
    n = w.out_features
    x2 = x.reshape(-1, k).astype(jnp.bfloat16)
    m = x2.shape[0]
    m_pad = -m % M_ALIGN
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))

    interpret = jax.default_backend() != "tpu"
    out = _quant_matmul_2d(
        x2, w.qweight, w.scales, w.bits, w.group, k, n, interpret
    )
    if m_pad:
        out = out[:m]
    return out.reshape(*leading, n)
