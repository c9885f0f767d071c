"""Fused w8a8 gate_up + SiLU kernel for the decode MLP hot path.

Round-5 roofline work (VERDICT item 1): the per-column w8a8 matmul kernels
already stream weights at ~718 GB/s — within 2-3% of this chip's measured
achievable HBM rate (~735 GB/s, tools/mlp_roofline_probe.py) — so the
remaining decode-MLP gap is the XLA glue BETWEEN the kernels: the gate_up
kernel's [M, 2H] f32 output round-trips HBM through the xs-rescale /
split / silu / multiply / bf16-cast / re-quantize chain (~30 MB/layer at
the 7B decode shape, ~43 us of the measured 0.32 ms/layer MLP).

This kernel folds that chain into the gate_up matmul epilogue:

  * grid over H-tiles; per step it reads the GATE tile and the UP tile as
    two operands with different index maps — for the fused [D, 2H] weight
    (quant.fuse_params) the SAME array is passed twice, with the up map
    offset by H/bh blocks: two DMAs into one HBM buffer, zero copies.
  * int8 MXU dots (identical int32-accumulate math to
    quant_matmul._w8a8_percol_kernel), per-column weight scales + the
    per-token activation scale applied in f32 registers, then
    h = silu(g) * u cast to bf16 — the only HBM write is the [M, bh] bf16
    h tile (2.4 MB/layer instead of ~30 MB of f32 round trips).

The down projection stays on the existing per-column w8a8 kernel: h is
re-quantized per-token by the caller exactly as before, so end-to-end MLP
numerics match the unfused path bit-for-bit in the int8 dots and to f32
rounding order in the epilogue.

Reference seat: the reference harness has no serving stack at all (SURVEY
§2.3-2.4); this kernel serves BASELINE.json's "fused INT8 dequant+matmul
Pallas kernels ... at speed-of-light" requirement for the MLP half of the
decode step.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: H-tile width candidates, widest first.  512 -> 37 grid steps at the 7B
#: shape (H=18944): per step the kernel streams 2 * K * BH (gate + up) —
#: 3.67 MB, big enough that the ~0.1 us/step Mosaic overhead vanishes,
#: small enough that double-buffered tiles + the resident xq block stay
#: ~8 MB of VMEM.  Narrower tiles serve TP shards (H/tp loses powers of
#: two to the 37 factor: 18944/tp4 = 4736 tiles at 128).
_BH_CANDIDATES = (512, 256, 128)


def _pick_bh(h_dim: int):
    for bh in _BH_CANDIDATES:
        if h_dim % bh == 0:
            return bh
    return None


def _gateup_silu_kernel(xq_ref, xs_ref, qg_ref, qu_ref, sg_ref, su_ref,
                        out_ref):
    """One H-tile: h = silu(gate) * up in f32 registers, bf16 out.

    xq  [M, K] int8      — per-token quantized activations (resident)
    xs  [M, 1] f32       — per-token activation scales
    qg  [K, BH] int8     — gate weight tile
    qu  [K, BH] int8     — up weight tile
    sg  [1, 1, BH] bf16  — per-column gate scales
    su  [1, 1, BH] bf16  — per-column up scales
    out [M, BH] bf16     — h tile
    """
    ig = jnp.dot(xq_ref[:], qg_ref[:], preferred_element_type=jnp.int32)
    iu = jnp.dot(xq_ref[:], qu_ref[:], preferred_element_type=jnp.int32)
    xs = xs_ref[:]  # [M, 1]
    g = ig.astype(jnp.float32) * sg_ref[0, 0, :].astype(jnp.float32)[None, :]
    u = iu.astype(jnp.float32) * su_ref[0, 0, :].astype(jnp.float32)[None, :]
    g = g * xs
    u = u * xs
    h = (g * jax.nn.sigmoid(g)) * u
    out_ref[:] = h.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("k", "h_dim", "fused", "bh", "interpret"),
)
def _gateup_silu_call(xq, xs, qg, qu, sg, su, k, h_dim, fused, bh,
                      interpret):
    """qg/qu: the fused [K, 2H] array passed twice (fused=True, up tiles
    offset by H/bh blocks) or separate [K, H] gate / up arrays."""
    m = xq.shape[0]
    n_tiles = h_dim // bh
    if fused:
        up_map = lambda i: (0, i + n_tiles)  # noqa: E731
        s_up_map = lambda i: (0, 0, i + n_tiles)  # noqa: E731
    else:
        up_map = lambda i: (0, i)  # noqa: E731
        s_up_map = lambda i: (0, 0, i)  # noqa: E731
    flops = 2 * 2 * m * k * h_dim
    bytes_accessed = 2 * k * h_dim + m * k + m * h_dim * 2
    return pl.pallas_call(
        _gateup_silu_kernel,
        out_shape=jax.ShapeDtypeStruct((m, h_dim), jnp.bfloat16),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bh), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bh), up_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bh), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bh), s_up_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, bh), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xq, xs, qg, qu, sg, su)


def _percol_w8a8(w) -> bool:
    return (
        w is not None
        and getattr(w, "act", None) == "int8"
        and getattr(w, "bits", None) == 8
        and w.scales.shape[0] == 1  # per-column scales
    )


def supports(mlp_params: dict, m_total: int) -> Tuple[bool, Optional[str]]:
    """Whether the fused decode path applies: per-column w8a8 gate/up
    (fused or separate), decode-shaped M, and K/H that tile evenly."""
    from caesar_tpu.ops.quant_matmul import _XLA_M

    if m_total >= _XLA_M:
        return False, "prefill-shaped M"
    if "gate_up" in mlp_params:
        w = mlp_params["gate_up"]
        if not _percol_w8a8(w):
            return False, "gate_up not per-column w8a8"
        k = w.qweight.shape[0]
        h_dim = w.qweight.shape[1] // 2
    else:
        wg, wu = mlp_params.get("gate"), mlp_params.get("up")
        if not (_percol_w8a8(wg) and _percol_w8a8(wu)):
            return False, "gate/up not per-column w8a8"
        if wg.qweight.shape != wu.qweight.shape:
            return False, "gate/up shape mismatch"
        k = wg.qweight.shape[0]
        h_dim = wg.qweight.shape[1]
    if _pick_bh(h_dim) is None or k % 128:
        return False, f"H={h_dim} K={k} do not tile"
    return True, None


def gateup_silu(mlp_params: dict, x2: jax.Array,
                tp_axis: Optional[str] = None) -> jax.Array:
    """x2 [M, K] (decode-shaped) -> h [M, H] bf16 = silu(x Wg) * (x Wu).

    Caller guarantees supports(...) is True.  tp_axis: gate/up are
    column-sharded under TP and x is replicated over the full K, so the
    per-token activation scale needs no sync here (quantize_activations'
    pmax is only for ROW-sharded operands — the down projection, which
    stays on its existing path).
    """
    from caesar_tpu.engine.quant import quantize_activations

    interpret = jax.default_backend() != "tpu"
    m = x2.shape[0]
    m_pad = -m % 32
    if m_pad:
        x2 = jnp.pad(x2, ((0, m_pad), (0, 0)))
    xq, xs = quantize_activations(x2.astype(jnp.bfloat16))
    if "gate_up" in mlp_params:
        w = mlp_params["gate_up"]
        k = w.qweight.shape[0]
        h_dim = w.qweight.shape[1] // 2
        s3 = w.scales.reshape(1, 1, -1)
        h = _gateup_silu_call(
            xq, xs[:, None], w.qweight, w.qweight, s3, s3,
            k, h_dim, True, _pick_bh(h_dim), interpret,
        )
    else:
        wg, wu = mlp_params["gate"], mlp_params["up"]
        k = wg.qweight.shape[0]
        h_dim = wg.qweight.shape[1]
        h = _gateup_silu_call(
            xq, xs[:, None], wg.qweight, wu.qweight,
            wg.scales.reshape(1, 1, -1), wu.scales.reshape(1, 1, -1),
            k, h_dim, False, _pick_bh(h_dim), interpret,
        )
    if m_pad:
        h = h[:m]
    return h
