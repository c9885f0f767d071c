"""Sharding plans: tensor-parallel serving over a device mesh.

TPU-idiomatic scaling (SURVEY.md §2.3's "what the TPU build owes"): pick a
Mesh, annotate shardings with NamedSharding/PartitionSpec, and let GSPMD
insert the collectives — no hand-written NCCL-style communication.

Tensor-parallel plan (Megatron-style pairings so each block needs exactly
one all-reduce per sub-block, which XLA emits automatically):

    wq/wk/wv, gate/up : [in, out]  -> shard OUT over "tp"  (column-parallel)
    wo, down          : [in, out]  -> shard IN  over "tp"  (row-parallel)
    biases bq/bk/bv   : [out]      -> shard over "tp"
    unembed           : [dim, vocab] -> shard vocab over "tp"
    embed, norms      : replicated
    KV pages          : [L, pages, n_kv, page, hd] -> shard n_kv over "tp"

Attention is head-parallel: q heads and kv heads both split over "tp"
(n_heads and n_kv_heads must divide tp), so paged attention is fully local
per shard; the one collective per layer is the psum XLA inserts after the
row-parallel wo/down matmuls.

Quantized weights shard by the same rule applied to their leaves: qweight
[in(, packed), out] like the dense weight, scales [groups, out] sharded on
out for column-parallel / on groups for row-parallel.

Data parallelism at serving scale = engine replicas, each owning its own
submesh, KV pool, and slot batch (see engine/replicas.py) — trajectories are
embarrassingly parallel across replicas exactly as the reference's
trajectory pool was across GPUs (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from caesar_tpu.engine.kvcache import PagedKVCache
from caesar_tpu.engine.model import ModelSpec
from caesar_tpu.engine.quant import QuantizedLinear


def make_mesh(
    tp: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """A 1D tensor-parallel mesh over `tp` devices."""
    if devices is None:
        devices = jax.devices()[:tp]
    if len(devices) < tp:
        raise ValueError(f"need {tp} devices, have {len(devices)}")
    import numpy as np

    return Mesh(np.asarray(devices[:tp]), axis_names=("tp",))


# ----------------------------------------------------------------------


def _shard_leaf(leaf, mesh: Mesh, spec: P):
    sharding = NamedSharding(mesh, spec)
    flat = jax.tree.leaves(leaf)
    if flat and isinstance(flat[0], jax.ShapeDtypeStruct):
        # abstract placement: lets the whole plan run on jax.eval_shape
        # trees for AOT topology probes (tools/config4_probe.py compiles
        # the 32B tp=8 serving step against a v5e topology without ever
        # materializing the weights).  `leaf` may itself be a small pytree
        # (the quantized unembed head) — map the sharding over its leaves.
        return jax.tree.map(
            lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype,
                                           sharding=sharding),
            leaf,
        )
    return jax.device_put(leaf, sharding)


def _refine_group(w: QuantizedLinear, tp: int) -> QuantizedLinear:
    """Re-express a quantized weight with a finer group size whose scale
    rows divide tp (scale row r' of the refined table = scales[r'*g'//g]),
    so row-parallel shards each hold exactly their own scale rows."""
    import dataclasses
    import math

    if w.w4a8:  # column-planar packing: qweight rows ARE the in dim
        k = w.qweight.shape[0]
    else:
        k = w.qweight.shape[0] * (2 if w.bits == 4 else 1)
    if k % tp:
        raise ValueError(f"cannot row-shard in={k} over tp={tp}")
    g_new = math.gcd(w.group, k // tp)
    if w.bits == 4 and not w.w4a8 and g_new % 2:
        raise ValueError("int4 refinement needs an even group")
    repeat = w.group // g_new
    return dataclasses.replace(
        w,
        scales=jnp.repeat(w.scales, repeat, axis=0),
        group=g_new,
    )


def _shard_linear(w, mesh: Mesh, column: bool):
    """Shard a dense or quantized [in, out] weight."""
    if isinstance(w, QuantizedLinear):
        import dataclasses

        # w4a8 planar scales are [groups, 2, out//2]: the column shard
        # rides the last axis; packed cols [p0:p1] are true cols [2p0:2p1]
        # (the 64-true-col block pairing keeps every supported shard
        # boundary — multiples of 64 — block-aligned)
        s3 = w.scales.ndim == 3
        if column:
            qspec = P(None, "tp")
            sspec = P(None, None, "tp") if s3 else P(None, "tp")
        else:
            qspec = P("tp", None)
            sspec = P("tp", None, None) if s3 else P("tp", None)
            if w.scales.shape[0] % mesh.shape["tp"]:
                # fewer scale rows than shards (tiny models / big groups):
                # refine the group by repeating scale rows — numerically
                # identical, and keeps every shard's local slice
                # self-describing (shard_map kernels derive group from the
                # local scales shape)
                w = _refine_group(w, mesh.shape["tp"])
        # dataclasses.replace keeps ALL metadata (notably `act` — dropping
        # it silently degraded w8a8 to weight-only int8 under TP)
        return dataclasses.replace(
            w,
            qweight=_shard_leaf(w.qweight, mesh, qspec),
            scales=_shard_leaf(w.scales, mesh, sspec),
        )
    spec = P(None, "tp") if column else P("tp", None)
    return _shard_leaf(w, mesh, spec)


def param_shardings(spec: ModelSpec, mesh: Mesh) -> dict:
    """PartitionSpec tree mirroring the params tree (for docs/tests)."""
    layer = {
        "ln_attn": P(None),
        "ln_mlp": P(None),
        "wq": P(None, "tp"),
        "wk": P(None, "tp"),
        "wv": P(None, "tp"),
        "wo": P("tp", None),
        "mlp": {
            "gate": P(None, "tp"),
            "up": P(None, "tp"),
            "down": P("tp", None),
        },
    }
    if spec.attn_bias:
        layer.update({"bq": P("tp"), "bk": P("tp"), "bv": P("tp")})
    tree = {
        "embed": P(None, None),
        "layers": [dict(layer) for _ in range(spec.n_layers)],
        "ln_out": P(None),
    }
    if not spec.tie_embeddings:
        tree["unembed"] = P(None, "tp")
    return tree


def shard_params(spec: ModelSpec, params: dict, mesh: Mesh) -> dict:
    """Place a params tree onto the mesh per the TP plan."""
    tp = mesh.shape["tp"]
    if spec.n_heads % tp or spec.n_kv_heads % tp:
        raise ValueError(
            f"tp={tp} must divide n_heads={spec.n_heads} and "
            f"n_kv_heads={spec.n_kv_heads}"
        )
    out = {
        "embed": _shard_leaf(params["embed"], mesh, P(None, None)),
        "ln_out": _shard_leaf(params["ln_out"], mesh, P(None)),
        "layers": [],
    }
    for layer in params["layers"]:
        new = {
            "ln_attn": _shard_leaf(layer["ln_attn"], mesh, P(None)),
            "ln_mlp": _shard_leaf(layer["ln_mlp"], mesh, P(None)),
            "wq": _shard_linear(layer["wq"], mesh, column=True),
            "wk": _shard_linear(layer["wk"], mesh, column=True),
            "wv": _shard_linear(layer["wv"], mesh, column=True),
            "wo": _shard_linear(layer["wo"], mesh, column=False),
            "mlp": {
                "gate": _shard_linear(layer["mlp"]["gate"], mesh, column=True),
                "up": _shard_linear(layer["mlp"]["up"], mesh, column=True),
                "down": _shard_linear(layer["mlp"]["down"], mesh, column=False),
            },
        }
        for b in ("bq", "bk", "bv"):
            if b in layer:
                new[b] = _shard_leaf(layer[b], mesh, P("tp"))
        out["layers"].append(new)
    if "unembed" in params:
        out["unembed"] = _shard_leaf(params["unembed"], mesh, P(None, "tp"))
    return out


def shard_cache(cache: PagedKVCache, mesh: Mesh) -> PagedKVCache:
    """Shard the KV pool over kv heads (attention stays shard-local).

    Pool layout is head-major: [L, n_pages, n_kv, page, hd] (kvcache.py)."""
    spec = P(None, None, "tp", None, None)
    return PagedKVCache(
        k_pages=_shard_leaf(cache.k_pages, mesh, spec),
        v_pages=_shard_leaf(cache.v_pages, mesh, spec),
        page_size=cache.page_size,
    )
