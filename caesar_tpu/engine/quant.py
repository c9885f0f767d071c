"""Weight-only quantization: INT8 and INT4 with grouped scales.

The quantized-serving core the BASELINE.json north star names: weights are
stored as int8 (or int4 packed two-per-byte along the reduction axis) plus
bf16 group scales; activations stay bf16.  Dequantization happens inside the
matmul — on TPU via the fused Pallas kernel (ops/quant_matmul.py), elsewhere
via an XLA dequant+dot that the compiler fuses.

Layout choices (TPU-first):

* Weights are [in, out] ("row-major for the reduction"), scales
  [in/group, out]: the kernel walks the reduction axis in group-sized tiles,
  dequantizing a [group, out_tile] int block into VMEM registers right before
  the MXU consumes it — HBM traffic is 1 byte (or half) per weight instead
  of 2.
* Group size defaults to 128: one scale per (sublane-tile x output column),
  mapping exactly onto the MXU's 128-lane contraction, and matching common
  INT4 checkpoint formats (AWQ/GPTQ-style groupings) for quality parity.
* INT4 packs along `in` so both nibbles of a byte belong to the same group
  (same scale) — unpack is a shift/mask, no cross-group arithmetic.

QuantizedLinear is a registered pytree dataclass: it flows through jit /
shard_map like any array leaf, and model.linear() dispatches on its type.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Literal, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_GROUP = 128


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["qweight", "scales"],
    meta_fields=[
        "bits", "group", "out_features", "in_features", "act", "rank1",
    ],
)
@dataclasses.dataclass
class QuantizedLinear:
    """Quantized [in, out] weight.

    qweight: int8 — [in, out] for bits=8, [in//2, out] nibble-packed for
        bits=4 (low nibble = even row, high nibble = odd row).
    scales: bf16 — [in/group, out].
    act: "none" (weight-only, bf16 activations through the MXU) or "int8"
        (w8a8: activations quantized per-token-per-group at runtime and the
        MXU runs native int8xint8->int32 — no per-weight VPU dequant work,
        so the matmul is HBM-DMA-bound instead of VPU-bound).
    rank1: grouped scales are CONSTRAINED to a row (x) col outer product
        with row[0] == 1 (see _rank1_scales).  Decode kernels consume the
        stored product exactly as free grouped scales; the large-M
        (prefill) path recovers the factors, folds row[g] into the
        activations BEFORE per-token int8 quantization, and runs ONE
        native full-K int8 dot rescaled by col — grouped-scale quality at
        per-column-path prefill speed (the round-4 w4a8 prefill gap).
    """

    qweight: jax.Array
    scales: jax.Array
    bits: int
    group: int
    out_features: int
    in_features: int
    act: str = "none"
    rank1: bool = False

    @property
    def w4a8(self) -> bool:
        """bits=4 + int8 activations in the column-planar biased packing
        (see quantize_weight): qweight [in, out//2], scales
        [groups, 2, out//2].  Detected by the 3D scales — tiny models whose
        out dims can't planarize (out % 64 != 0 anywhere in the tree) keep
        the row-interleaved packing and serve through the XLA
        int8-activation path."""
        return self.bits == 4 and self.act == "int8" and self.scales.ndim == 3


def _rank1_scales(scales: np.ndarray) -> np.ndarray:
    """Constrain free grouped scales S [G, N] to row (x) col, row[0] = 1.

    row is the least-squares fit in log space (the per-group magnitude
    profile); col then COVERS the free scales per column
    (col[n] = max_g S[g, n] / row[g]), so the constrained scale is >= the
    free one everywhere — no weight ever clips, groups whose free scale
    was smaller just quantize with a slightly coarser step (the residual
    spread of S across groups, small for LLM linear weights)."""
    logs = np.log(scales)
    lr = logs.mean(axis=1)
    lr = lr - lr[0]  # normalize row[0] = 1 so col is recoverable as S[0]
    row = np.exp(lr)[:, None]  # [G, 1]
    col = np.max(scales / row, axis=0, keepdims=True)  # [1, N]
    return (row * col).astype(np.float32)


def quantize_weight(
    w: jax.Array | np.ndarray,
    bits: Literal[4, 8],
    group: int = DEFAULT_GROUP,
    act: str = "none",
    planar: bool | None = None,
    rank1: bool | None = None,
) -> QuantizedLinear:
    """Symmetric per-group quantization of an [in, out] weight.

    group=0 selects PER-COLUMN scales (one group spanning the whole
    reduction dim).  For the w8a8 kernel this collapses the per-group
    int32->f32 rescale chain to a single dot + rescale per tile (measured
    ~1 ms/step on the 7B decode, tools/step_probe.py PROBE_GROUP=full);
    int32 accumulation over the full K is still exact (K * 127^2 < 2^31
    for every supported shape).
    """
    w = np.asarray(w, dtype=np.float32)
    if w.ndim != 2:
        raise ValueError(f"expected 2D weight, got {w.shape}")
    d_in, d_out = w.shape
    if not group:
        group = d_in
    while d_in % group != 0 and group > 1:
        group //= 2  # shrink to a divisor for small dims (e.g. test models)
    if d_in % group != 0:
        group = d_in
    qmax = 127.0 if bits == 8 else 7.0

    grouped = w.reshape(d_in // group, group, d_out)
    absmax = np.abs(grouped).max(axis=1)  # [n_groups, out]
    scales = np.maximum(absmax / qmax, 1e-8).astype(np.float32)
    if planar is None:
        planar = d_out % 64 == 0
    if rank1 is None:
        # default OFF: rank-1 makes the large-M path one native int8 dot,
        # but the scorecard measured its identical-weights ppl delta at
        # 13.2% vs free-grouped's 3.1% on random init (docs/QUALITY_r5
        # .json) — the covering col inflates every group's step when the
        # weight rows have no magnitude profile.  It remains an explicit
        # opt-in for real checkpoints, whose grouped-scale row structure
        # is what the factorization exploits.
        rank1 = False
    rank1 = bool(rank1) and group < d_in  # per-column is trivially rank-1
    if rank1:
        scales = _rank1_scales(scales)
    q = np.clip(
        np.rint(grouped / scales[:, None, :]), -qmax, qmax
    ).astype(np.int8)
    q = q.reshape(d_in, d_out)

    if bits == 4 and act == "int8" and planar and d_out % 64 == 0:
        # w4a8: COLUMN-planar biased packing.  A byte at [k, 32*b + o]
        # (o < 32) holds columns 64*b + o (low nibble) and 64*b + 32 + o
        # (high nibble) of true column-block b, each stored BIASED by +8
        # (0..15).  Why this layout, vs the row-interleaved packing below:
        #   * full-K unpacked planes -> the kernel's int8 MXU dots contract
        #     over the whole 128-wide group (no split-stream half dots);
        #   * biased nibbles unpack with 2 bit ops (&0xF / >>4), no
        #     sign-extension chain — the bias is linear, so the kernel
        #     subtracts 8 * group-rowsum(x) from each int32 group sum;
        #   * pairing columns 32 apart WITHIN a 64 block keeps any column
        #     shard at 64-true-col granularity self-contained — packed
        #     cols [p0:p1] are exactly true cols [2p0:2p1] (every
        #     supported shape shards at >= 64: hidden 18944 / tp8 = 2368).
        # Scales are stored planar [groups, 2, out//2] to match.
        qb = (q + 8).astype(np.uint8)  # 0..15
        blocks = qb.reshape(d_in, d_out // 64, 2, 32)
        q = (blocks[:, :, 0, :] | (blocks[:, :, 1, :] << 4)).astype(
            np.int8
        ).reshape(d_in, d_out // 2)
        s_pl = scales.reshape(-1, d_out // 64, 2, 32).transpose(0, 2, 1, 3)
        scales = np.ascontiguousarray(s_pl).reshape(-1, 2, d_out // 2)
    elif bits == 4:
        if d_in % 2 != 0:
            raise ValueError("int4 packing needs even in dim")
        low = q[0::2].astype(np.uint8) & 0x0F
        high = (q[1::2].astype(np.uint8) & 0x0F) << 4
        q = (low | high).astype(np.int8)  # [in//2, out]

    return QuantizedLinear(
        qweight=jnp.asarray(q),
        scales=jnp.asarray(scales, dtype=jnp.bfloat16),
        bits=int(bits),
        group=int(group),
        out_features=d_out,
        in_features=d_in,
        act=str(act),
        rank1=rank1,
    )


def quantize_activations(
    x: jax.Array, tp_axis: str | None = None
) -> Tuple[jax.Array, jax.Array]:
    """Per-token symmetric int8 activation quantization.

    x [M, K] -> (q [M, K] int8, scales [M] f32).  Runs as plain XLA next to
    the matmul (reads/writes only the tiny activation, fused by the
    compiler).  Per-token (not per-group) scaling keeps the activation scale
    OUT of the kernel's inner loop: the kernel rescales the int32 group sums
    by the weight scales only, and the caller multiplies the [M, N] output
    by xs[:, None] once — a column-broadcast the Mosaic lane layout cannot
    express efficiently inside the kernel.

    tp_axis (inside shard_map, row-parallel matmuls): the token's K features
    are split over shards, so the per-token absmax is pmax'd over the axis —
    every shard quantizes with the GLOBAL scale and tensor-parallel outputs
    stay numerically identical to single-device ([M] floats, riding the
    psum the row-parallel matmul already pays).
    """
    m, k = x.shape
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    if tp_axis is not None:
        absmax = jax.lax.pmax(absmax, tp_axis)
    xs = jnp.maximum(absmax / 127.0, 1e-8)  # [M]
    q = jnp.clip(jnp.round(xf / xs[:, None]), -127, 127).astype(jnp.int8)
    return q, xs


def _unpack_int4(packed: jax.Array, in_features: int) -> jax.Array:
    """[in//2, out] nibble-packed int8 -> [in, out] int8 in [-7, 7]."""
    as_u8 = packed.astype(jnp.uint8)
    low = (as_u8 & 0x0F).astype(jnp.int8)
    high = ((as_u8 >> 4) & 0x0F).astype(jnp.int8)
    # sign-extend 4-bit two's complement: v >= 8 -> v - 16
    low = jnp.where(low >= 8, low - 16, low)
    high = jnp.where(high >= 8, high - 16, high)
    interleaved = jnp.stack([low, high], axis=1)  # [in//2, 2, out]
    return interleaved.reshape(in_features, packed.shape[-1])


def _unpack_w4a8(packed: jax.Array) -> jax.Array:
    """Column-planar biased [in, out//2] -> [in, out] int8 in TRUE column
    order (reference/fallback path only; the kernel consumes planes)."""
    k, half = packed.shape
    u = packed.astype(jnp.uint8)
    lo = (u & 0x0F).astype(jnp.int8) - 8  # [k, half]
    hi = ((u >> 4) & 0x0F).astype(jnp.int8) - 8
    # packed col 32b+o -> true cols (64b+o, 64b+32+o)
    lo = lo.reshape(k, half // 32, 1, 32)
    hi = hi.reshape(k, half // 32, 1, 32)
    return jnp.concatenate([lo, hi], axis=2).reshape(k, 2 * half)


def _unplanarize_scales(scales: jax.Array) -> jax.Array:
    """w4a8 planar scales [groups, 2, out//2] -> TRUE order [groups, out]."""
    g, _, half = scales.shape
    s = scales.reshape(g, 2, half // 32, 32)
    return jnp.swapaxes(s, 1, 2).reshape(g, 2 * half)


def rank1_factors(w: "QuantizedLinear"):
    """Recover (row [G], col [N]) factors from a rank1 QuantizedLinear's
    stored planar PRODUCT scales.

    row[0] == 1 by construction (_rank1_scales), so col is exactly the
    stored first scale row; row is averaged over columns to wash out the
    bf16 storage rounding of the products (each ratio is row_g within one
    bf16 ulp — the mean is row_g to ~2^-8/sqrt(N))."""
    s = _unplanarize_scales(w.scales).astype(jnp.float32)
    col = s[0]
    row = jnp.mean(s / col[None, :], axis=1)
    return row, col


def local_dims(w: QuantizedLinear) -> Tuple[int, int, int]:
    """(in, out, group) from the ARRAY shapes — inside shard_map the leaves
    are per-shard slices while in/out_features metadata stays global."""
    if w.w4a8:
        k = w.qweight.shape[0]
        n = w.qweight.shape[1] * 2
    else:
        k = w.qweight.shape[0] * (2 if w.bits == 4 else 1)
        n = w.qweight.shape[1]
    return k, n, k // w.scales.shape[0]


def dequantize(w: QuantizedLinear, dtype=jnp.bfloat16) -> jax.Array:
    """Materialize the bf16 weight (reference/fallback path; the Pallas
    kernel dequantizes in VMEM instead)."""
    k, n, group = local_dims(w)
    if w.w4a8:
        q = _unpack_w4a8(w.qweight)
        scales = _unplanarize_scales(w.scales)
    else:
        q = w.qweight if w.bits == 8 else _unpack_int4(w.qweight, k)
        scales = w.scales
    grouped = q.reshape(k // group, group, n)
    scaled = grouped.astype(jnp.float32) * scales.astype(jnp.float32)[:, None, :]
    return scaled.reshape(k, n).astype(dtype)


def _use_pallas() -> bool:
    if os.environ.get("CAESAR_DISABLE_PALLAS_QUANT"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def quantized_matmul(
    x: jax.Array, w: QuantizedLinear, tp_axis: str | None = None,
    out_dtype=None,
) -> jax.Array:
    """x [..., in] @ w -> [..., out] in f32 accumulation.

    TPU: fused dequant+matmul Pallas kernel (weights dequantized tile-by-tile
    in VMEM).  Elsewhere: XLA dequant + dot (fused by the compiler, used in
    CPU tests).  tp_axis: see quantize_activations — row-parallel callers
    inside shard_map pass the mesh axis so w8a8 uses the global scale.
    out_dtype: bias-free call sites pass the activation dtype so the
    kernel may emit it directly (quant_matmul_pallas docstring); the
    returned array is then already out_dtype instead of f32."""
    if _use_pallas():
        from caesar_tpu.ops.quant_matmul import quant_matmul_pallas

        return quant_matmul_pallas(x, w, tp_axis=tp_axis,
                                   out_dtype=out_dtype)
    if w.act == "int8":
        return _w8a8_matmul_xla(x, w, tp_axis=tp_axis)
    wf = dequantize(w, dtype=jnp.bfloat16)
    return jnp.dot(x, wf, preferred_element_type=jnp.float32)


def _w8a8_matmul_xla(
    x: jax.Array, w: QuantizedLinear, tp_axis: str | None = None
) -> jax.Array:
    """XLA emulation of the w8a8 kernel (CPU tests / non-TPU backends).

    Same numerics as the Pallas path: activations int8 per-token, int
    products accumulated exactly within each weight group (int32 on device;
    f32 here is exact too — group sums stay < 2^24), per-group rescale by
    the weight scale, per-token rescale at the end.
    """
    leading = x.shape[:-1]
    k, n, group = local_dims(w)
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if w.w4a8:
        qw = _unpack_w4a8(w.qweight)
        scales = _unplanarize_scales(w.scales)
    else:
        qw = w.qweight if w.bits == 8 else _unpack_int4(w.qweight, k)
        scales = w.scales
    xq, xs = quantize_activations(x2, tp_axis)  # [M, K] i8, [M] f32
    g = k // group
    xg = xq.reshape(m, g, group).astype(jnp.float32)
    wg = qw.reshape(g, group, n).astype(jnp.float32)
    ig = jnp.einsum("mgk,gkn->mgn", xg, wg)  # exact int math in f32
    out = jnp.sum(ig * scales.astype(jnp.float32)[None], axis=1)
    out = out * xs[:, None]
    return out.reshape(*leading, n)


def quantize_params(
    params,
    bits: Literal[4, 8],
    group: int = DEFAULT_GROUP,
    act: str = "none",
    rank1: bool | None = None,
):
    """Quantize every linear weight of a model params tree (embeddings and
    norms stay bf16, matching weight-only serving practice)."""
    # w4a8 planarity is a PER-MODEL decision: fuse_params concatenates
    # wq/wk/wv (and gate/up), so mixing planar and row-interleaved parts
    # in one tree is illegal — planar only when every out dim allows it
    planar = bits == 4 and act == "int8" and all(
        layer[key].shape[1] % 64 == 0
        for layer in params["layers"]
        for key in ("wq", "wk", "wv", "wo")
    ) and all(
        layer["mlp"][key].shape[1] % 64 == 0
        for layer in params["layers"]
        for key in ("gate", "up", "down")
    )
    quantized_layers = []
    for layer in params["layers"]:
        new_layer = dict(layer)
        for key in ("wq", "wk", "wv", "wo"):
            new_layer[key] = quantize_weight(
                layer[key], bits, group, act, planar=planar, rank1=rank1
            )
        new_mlp = dict(layer["mlp"])
        for key in ("gate", "up", "down"):
            new_mlp[key] = quantize_weight(
                layer["mlp"][key], bits, group, act, planar=planar,
                rank1=rank1,
            )
        new_layer["mlp"] = new_mlp
        quantized_layers.append(new_layer)
    out = dict(params)
    out["layers"] = quantized_layers
    return out


def _fusable(parts) -> bool:
    """rank-1 parts cannot concat along out: each part's scales are
    row_p (x) col_p with DIFFERENT row factors, so the concatenation is
    rank-2 and the large-M factorized path would silently miscompute.
    fuse_params keeps such parts separate."""
    return not any(
        isinstance(p, QuantizedLinear) and p.rank1 for p in parts
    )


def _concat_out(parts):
    """Concatenate [in, out_i] weights (dense or quantized) along out."""
    if isinstance(parts[0], QuantizedLinear):
        bits = parts[0].bits
        group = parts[0].group
        assert _fusable(parts), "rank-1 scaled parts must not be fused"
        assert all(p.bits == bits and p.group == group for p in parts)
        # w4a8 planar concat is exact: packed-col blocks map positionally
        # to true-col blocks, so concatenating packed cols (and the planar
        # scales' last axis) IS the true-order concat
        s_axis = parts[0].scales.ndim - 1
        return QuantizedLinear(
            qweight=jnp.concatenate([p.qweight for p in parts], axis=1),
            scales=jnp.concatenate([p.scales for p in parts], axis=s_axis),
            bits=bits,
            group=group,
            out_features=sum(p.out_features for p in parts),
            in_features=parts[0].in_features,
            act=parts[0].act,
        )
    return jnp.concatenate(parts, axis=1)


def fuse_params(params: dict) -> dict:
    """Fuse per-layer projections for single-device serving: wq/wk/wv ->
    wqkv and gate/up -> gate_up.  One big matmul launches faster than three
    small ones (per-kernel overhead and better tiling), and the split after
    the matmul is free under XLA fusion.  NOT applied under tensor-parallel
    sharding — column splits of the fused weight would cross q/k/v head
    boundaries and force resharding at the split.

    Works uniformly on dense and quantized layers (group scales are along
    the in-dim, untouched by an out-dim concat).
    """
    out = dict(params)
    layers = []
    for layer in params["layers"]:
        new = dict(layer)
        if _fusable([layer["wq"], layer["wk"], layer["wv"]]):
            new["wqkv"] = _concat_out(
                [layer["wq"], layer["wk"], layer["wv"]]
            )
            for key in ("wq", "wk", "wv"):
                del new[key]
            if "bq" in layer:
                new["bqkv"] = jnp.concatenate(
                    [layer["bq"], layer["bk"], layer["bv"]]
                )
                for key in ("bq", "bk", "bv"):
                    del new[key]
        new_mlp = dict(layer["mlp"])
        if _fusable([layer["mlp"]["gate"], layer["mlp"]["up"]]):
            new_mlp["gate_up"] = _concat_out(
                [layer["mlp"]["gate"], layer["mlp"]["up"]]
            )
            del new_mlp["gate"], new_mlp["up"]
        new["mlp"] = new_mlp
        layers.append(new)
    out["layers"] = layers
    return out
