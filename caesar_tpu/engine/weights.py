"""Weight loading: HF safetensors checkpoints or seeded random init.

Checkpoint path: a directory with config.json + *.safetensors in HF
Qwen2/Llama naming is mapped into the engine's params tree ([in, out]
weight layout — HF stores [out, in], so projections transpose on load).
Zero-egress environments (no downloadable weights) fall back to seeded
random init with realistic scaling so serving benchmarks exercise the exact
compute/memory paths of the real checkpoints.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from caesar_tpu.engine.model import MODEL_PRESETS, ModelSpec


# ----------------------------------------------------------------------
# random init
# ----------------------------------------------------------------------


def init_params(
    spec: ModelSpec,
    seed: int = 0,
    dtype=jnp.bfloat16,
    quant_bits: Optional[int] = None,
    quant_group: int = 128,
    act: str = "none",
) -> dict:
    """Seeded random params with 1/sqrt(fan_in) scaling.

    Uses numpy RNG + device_put per leaf (not jax.random on-device): at 7B+
    scale the host loop streams leaves to HBM without materializing a second
    full copy, mirroring how a checkpoint load behaves.  With quant_bits set
    (8 or 4), linear weights are quantized ON HOST and only the int
    representation ever reaches the device — a 7B INT8 model never holds
    bf16 weights in HBM.
    """
    from caesar_tpu.engine.quant import quantize_weight

    rng = np.random.default_rng(seed)

    def mat(d_in: int, d_out: int) -> jax.Array:
        w = rng.standard_normal((d_in, d_out), dtype=np.float32)
        w *= 1.0 / np.sqrt(d_in)
        if quant_bits is not None:
            # planarity is per-model (see quantize_params): uniform across
            # the tree so fuse_params can concat wq/wk/wv and gate/up
            planar = act == "int8" and all(
                d % 64 == 0
                for d in (spec.q_dim, spec.kv_dim, spec.dim, spec.hidden)
            )
            return quantize_weight(w, bits=quant_bits, group=quant_group,
                                   act=act, planar=planar)
        return jnp.asarray(w, dtype=dtype)

    def vec(d: int, value: float = 1.0) -> jax.Array:
        return jnp.full((d,), value, dtype=dtype)

    layers = []
    for _ in range(spec.n_layers):
        layer = {
            "ln_attn": vec(spec.dim),
            "ln_mlp": vec(spec.dim),
            "wq": mat(spec.dim, spec.q_dim),
            "wk": mat(spec.dim, spec.kv_dim),
            "wv": mat(spec.dim, spec.kv_dim),
            "wo": mat(spec.q_dim, spec.dim),
            "mlp": {
                "gate": mat(spec.dim, spec.hidden),
                "up": mat(spec.dim, spec.hidden),
                "down": mat(spec.hidden, spec.dim),
            },
        }
        if spec.attn_bias:
            layer["bq"] = jnp.zeros((spec.q_dim,), dtype=dtype)
            layer["bk"] = jnp.zeros((spec.kv_dim,), dtype=dtype)
            layer["bv"] = jnp.zeros((spec.kv_dim,), dtype=dtype)
        layers.append(layer)

    params = {
        "embed": jnp.asarray(
            rng.standard_normal((spec.vocab, spec.dim), dtype=np.float32) * 0.02,
            dtype=dtype,
        ),
        "layers": layers,
        "ln_out": vec(spec.dim),
    }
    if not spec.tie_embeddings:
        # the unembedding stays dense (weight-only quant serving keeps the
        # lm head in bf16, and _lm_head does a plain dot)
        w = rng.standard_normal((spec.dim, spec.vocab), dtype=np.float32)
        w *= 1.0 / np.sqrt(spec.dim)
        params["unembed"] = jnp.asarray(w, dtype=dtype)
    return params


def init_params_device(
    spec: ModelSpec,
    seed: int = 0,
    quant_bits: int = 8,
    quant_group: int = 128,
    dtype=jnp.bfloat16,
    act: str = "none",
) -> dict:
    """Random quantized params generated AND quantized on device.

    The host path (numpy init + per-leaf quantize_weight) is ~20 minutes of
    single-threaded CPU at 7B; the same work is seconds of on-device RNG +
    VPU math.  Values are random either way — only shapes/dtypes/layout must
    match the checkpoint path — so this is the loader for preset-model
    benchmarks (BENCH r1 recorded weights_load_s=1338 on the cold host
    path).  Peak transient memory is one f32 leaf (~2 GB at 7B); the
    resident result is the int8/int4 tree, same as the checkpoint loader's.
    """
    qmax = 127.0 if quant_bits == 8 else 7.0
    key = jax.random.PRNGKey(seed)
    counter = iter(range(10_000))

    def subkey():
        return jax.random.fold_in(key, next(counter))

    def ql(d_in: int, d_out: int):
        from caesar_tpu.engine.quant import QuantizedLinear

        group = quant_group or d_in  # 0 = per-column (see quantize_weight)
        while d_in % group != 0 and group > 1:
            group //= 2
        if d_in % group != 0:
            group = d_in
        w = jax.random.normal(subkey(), (d_in, d_out), jnp.float32)
        w = w * (1.0 / np.sqrt(d_in))
        grouped = w.reshape(d_in // group, group, d_out)
        absmax = jnp.max(jnp.abs(grouped), axis=1)
        scales = jnp.maximum(absmax / qmax, 1e-8)
        planar = act == "int8" and all(
            d % 64 == 0
            for d in (spec.q_dim, spec.kv_dim, spec.dim, spec.hidden)
        )
        # rank-1 scale constraint is OPT-IN (see quant.quantize_weight:
        # measured 13.2% ppl delta on random init vs 3.1% free-grouped)
        rank1 = (
            bool(os.environ.get("CAESAR_W4A8_RANK1"))
            and quant_bits == 4 and act == "int8" and planar
            and group < d_in
        )
        if rank1:
            logs = jnp.log(scales)
            lr = logs.mean(axis=1)
            row = jnp.exp(lr - lr[0])[:, None]
            col = jnp.max(scales / row, axis=0, keepdims=True)
            scales = row * col
        q = jnp.clip(
            jnp.round(grouped / scales[:, None, :]), -qmax, qmax
        ).astype(jnp.int8).reshape(d_in, d_out)
        scales = scales.astype(jnp.bfloat16)
        if quant_bits == 4 and act == "int8" and planar:
            # w4a8 column-planar biased packing (see quant.quantize_weight)
            qb = (q + 8).astype(jnp.uint8)
            blocks = qb.reshape(d_in, d_out // 64, 2, 32)
            q = (
                blocks[:, :, 0, :] | (blocks[:, :, 1, :] << 4)
            ).astype(jnp.int8).reshape(d_in, d_out // 2)
            scales = (
                scales.reshape(-1, d_out // 64, 2, 32)
                .transpose(0, 2, 1, 3)
                .reshape(-1, 2, d_out // 2)
            )
        elif quant_bits == 4:
            low = q[0::2].astype(jnp.uint8) & 0x0F
            high = (q[1::2].astype(jnp.uint8) & 0x0F) << 4
            q = (low | high).astype(jnp.int8)
        return QuantizedLinear(
            qweight=q, scales=scales,
            bits=quant_bits, group=group,
            out_features=d_out, in_features=d_in, act=act,
            rank1=bool(rank1),
        )

    def vec(d: int) -> jax.Array:
        return jnp.ones((d,), dtype=dtype)

    layers = []
    for _ in range(spec.n_layers):
        layer = {
            "ln_attn": vec(spec.dim),
            "ln_mlp": vec(spec.dim),
            "wq": ql(spec.dim, spec.q_dim),
            "wk": ql(spec.dim, spec.kv_dim),
            "wv": ql(spec.dim, spec.kv_dim),
            "wo": ql(spec.q_dim, spec.dim),
            "mlp": {
                "gate": ql(spec.dim, spec.hidden),
                "up": ql(spec.dim, spec.hidden),
                "down": ql(spec.hidden, spec.dim),
            },
        }
        if spec.attn_bias:
            layer["bq"] = jnp.zeros((spec.q_dim,), dtype=dtype)
            layer["bk"] = jnp.zeros((spec.kv_dim,), dtype=dtype)
            layer["bv"] = jnp.zeros((spec.kv_dim,), dtype=dtype)
        layers.append(layer)

    params = {
        "embed": (
            jax.random.normal(subkey(), (spec.vocab, spec.dim), jnp.float32)
            * 0.02
        ).astype(dtype),
        "layers": layers,
        "ln_out": vec(spec.dim),
    }
    if not spec.tie_embeddings:
        if spec.vocab % 256 == 0:  # kernel-tileable: quantized lm head
            params["unembed"] = ql(spec.dim, spec.vocab)
        else:
            params["unembed"] = (
                jax.random.normal(subkey(), (spec.dim, spec.vocab), jnp.float32)
                * (1.0 / np.sqrt(spec.dim))
            ).astype(dtype)
    return params


# ----------------------------------------------------------------------
# HF checkpoint loading
# ----------------------------------------------------------------------

_HF_LAYER_MAP = {
    # engine key -> HF suffix (weights transposed [out,in] -> [in,out])
    "wq": "self_attn.q_proj.weight",
    "wk": "self_attn.k_proj.weight",
    "wv": "self_attn.v_proj.weight",
    "wo": "self_attn.o_proj.weight",
    "mlp.gate": "mlp.gate_proj.weight",
    "mlp.up": "mlp.up_proj.weight",
    "mlp.down": "mlp.down_proj.weight",
}
_HF_BIAS_MAP = {
    "bq": "self_attn.q_proj.bias",
    "bk": "self_attn.k_proj.bias",
    "bv": "self_attn.v_proj.bias",
}
_HF_NORM_MAP = {
    "ln_attn": "input_layernorm.weight",
    "ln_mlp": "post_attention_layernorm.weight",
}


def spec_from_hf_config(config: dict, name: str = "checkpoint") -> ModelSpec:
    n_heads = config["num_attention_heads"]
    head_dim = config.get(
        "head_dim", config["hidden_size"] // n_heads
    )
    return ModelSpec(
        name=name,
        vocab=config["vocab_size"],
        dim=config["hidden_size"],
        n_layers=config["num_hidden_layers"],
        n_heads=n_heads,
        n_kv_heads=config.get("num_key_value_heads", n_heads),
        head_dim=head_dim,
        hidden=config["intermediate_size"],
        rope_theta=config.get("rope_theta", 1e6),
        rms_eps=config.get("rms_norm_eps", 1e-6),
        attn_bias=config.get("model_type", "qwen2") == "qwen2",
        tie_embeddings=config.get("tie_word_embeddings", False),
    )


def load_hf_checkpoint(
    ckpt_dir: str | os.PathLike, dtype=jnp.bfloat16
) -> tuple[ModelSpec, dict]:
    """Load a HF Qwen2/Llama safetensors checkpoint into the params tree."""
    from safetensors import safe_open

    ckpt_dir = Path(ckpt_dir)
    with open(ckpt_dir / "config.json") as f:
        config = json.load(f)
    spec = spec_from_hf_config(config, name=ckpt_dir.name)

    # index all tensors across shards
    tensor_files: Dict[str, Path] = {}
    for shard in sorted(ckpt_dir.glob("*.safetensors")):
        with safe_open(shard, framework="numpy") as f:
            for key in f.keys():
                tensor_files[key] = shard

    _handles: Dict[Path, object] = {}

    def get(key: str, transpose: bool = False) -> jax.Array:
        shard = tensor_files[key]
        if shard not in _handles:
            _handles[shard] = safe_open(shard, framework="numpy")
        arr = _handles[shard].get_tensor(key)
        if transpose:
            arr = arr.T
        return jnp.asarray(arr, dtype=dtype)

    layers = []
    for i in range(spec.n_layers):
        prefix = f"model.layers.{i}."
        layer: dict = {"mlp": {}}
        for eng_key, suffix in _HF_LAYER_MAP.items():
            value = get(prefix + suffix, transpose=True)
            if eng_key.startswith("mlp."):
                layer["mlp"][eng_key[4:]] = value
            else:
                layer[eng_key] = value
        for eng_key, suffix in _HF_NORM_MAP.items():
            layer[eng_key] = get(prefix + suffix)
        if spec.attn_bias:
            for eng_key, suffix in _HF_BIAS_MAP.items():
                layer[eng_key] = get(prefix + suffix)
        layers.append(layer)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "layers": layers,
        "ln_out": get("model.norm.weight"),
    }
    if not spec.tie_embeddings:
        params["unembed"] = get("lm_head.weight", transpose=True)
    return spec, params


def _maybe_quantize_head(
    spec: ModelSpec, params: dict, quant_bits, act: str = "none"
) -> dict:
    """Quantize the untied lm head (it is read whole every decode step —
    e.g. 1.1 GB bf16 at 7B — so weight-only quant applies to it too)."""
    from caesar_tpu.engine.quant import quantize_weight

    if quant_bits is None or spec.tie_embeddings or "unembed" not in params:
        return params
    w = params["unembed"]
    if w.shape[1] % 256 == 0:  # kernel-tileable vocab
        params = dict(params)
        params["unembed"] = quantize_weight(
            np.asarray(w, dtype=np.float32), bits=quant_bits, act=act
        )
    return params


# ----------------------------------------------------------------------
# params disk cache (random-init models): initializing + quantizing a 7B
# model host-side takes minutes on a small VM; the int arrays round-trip
# through one npz instead
# ----------------------------------------------------------------------


def _params_cache_path(
    model: str, quant: str, seed: int, group: int = 128
) -> Optional[Path]:
    base = os.environ.get(
        "CAESAR_WEIGHTS_CACHE", os.path.expanduser("~/.cache/caesar_weights")
    )
    if not base:
        return None
    gtag = "" if group == 128 else f"-g{group}"  # 128 keeps old cache names
    return Path(base) / f"{model}-{quant}{gtag}-s{seed}.npz"


def _save_params_cache(path: Path, params: dict) -> None:
    from caesar_tpu.engine.quant import QuantizedLinear

    flat = {}

    def walk(prefix: str, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(f"{prefix}.{i}", v)
        elif isinstance(node, QuantizedLinear):
            r1 = "r1" if node.rank1 else ""
            flat[f"{prefix}#q{node.bits}g{node.group}{r1}"] = np.asarray(
                node.qweight
            )
            flat[f"{prefix}#s"] = np.asarray(node.scales.astype(jnp.float32))
        else:
            flat[prefix] = np.asarray(
                node.astype(jnp.float32) if node.dtype == jnp.bfloat16 else node
            )
    walk("", params)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def _load_params_cache(path: Path, dtype) -> dict:
    from caesar_tpu.engine.quant import QuantizedLinear

    data = np.load(path)
    params: dict = {}

    def ensure(container, key_parts):
        node = container
        for i, part in enumerate(key_parts[:-1]):
            nxt = key_parts[i + 1]
            if part.isdigit():
                part = int(part)
                while len(node) <= part:
                    node.append({} if not nxt.isdigit() else [])
                node = node[part]
            else:
                node = node.setdefault(part, [] if nxt.isdigit() else {})
        return node, key_parts[-1]

    qmeta = {}
    for key in data.files:
        name, _, tag = key.partition("#")
        parts = name.split(".")
        node, leaf = ensure(params, parts)
        if tag.startswith("q"):
            bits, group = tag[1:].split("g")
            rank1 = group.endswith("r1")
            if rank1:
                group = group[:-2]
            qmeta[name] = (int(bits), int(group), rank1)
            entry = node.get(leaf) if isinstance(node, dict) else None
            value = {"qweight": jnp.asarray(data[key])}
            if isinstance(entry, dict):
                entry.update(value)
            else:
                _set(node, leaf, value)
        elif tag == "s":
            entry = node.get(leaf) if isinstance(node, dict) else None
            value = {"scales": jnp.asarray(data[key], dtype=jnp.bfloat16)}
            if isinstance(entry, dict):
                entry.update(value)
            else:
                _set(node, leaf, value)
        else:
            arr = data[key]
            out_dtype = dtype if arr.dtype == np.float32 else arr.dtype
            _set(node, leaf, jnp.asarray(arr, dtype=out_dtype))

    def _finalize(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"qweight", "scales"}:
                return node  # patched below with metadata
            return {k: _finalize(v) for k, v in node.items()}
        if isinstance(node, list):
            return [_finalize(v) for v in node]
        return node

    def _patch(prefix, node):
        if isinstance(node, dict):
            if set(node.keys()) == {"qweight", "scales"} and prefix in qmeta:
                bits, group, rank1 = qmeta[prefix]
                qw = node["qweight"]
                d_in = qw.shape[0] * (2 if bits == 4 else 1)
                from caesar_tpu.engine.quant import QuantizedLinear as QL

                return QL(
                    qweight=qw, scales=node["scales"], bits=bits, group=group,
                    out_features=qw.shape[1], in_features=d_in, rank1=rank1,
                )
            return {k: _patch(f"{prefix}.{k}" if prefix else k, v)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [_patch(f"{prefix}.{i}", v) for i, v in enumerate(node)]
        return node

    return _patch("", _finalize(params))


def _set(node, leaf, value):
    if isinstance(node, list):
        leaf = int(leaf)
        while len(node) <= leaf:
            node.append(None)
        node[leaf] = value
    else:
        node[leaf] = value


def _set_act_mode(params, act: str):
    """Tag every QuantizedLinear in the tree with an activation-quant mode
    (w8a8 shares the weight format with int8 — the tag is runtime-only)."""
    import dataclasses as _dc

    from caesar_tpu.engine.quant import QuantizedLinear

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, QuantizedLinear):
            return _dc.replace(node, act=act)
        return node

    return walk(params)


def resolve_quant_group(quant: str, quant_group: int = -1) -> int:
    """The effective scale-group size for a quant mode.

    quant_group -1 = auto: w8a8 uses PER-COLUMN scales (0) — the native
    int8 MXU kernel then runs one dot + one rescale per tile instead of a
    per-128-group rescale chain (~1 ms/step on the 7B decode) and int32
    accumulation stays exact — while the weight-only modes keep group 128
    (the dequant-in-VMEM kernels pay nothing for finer groups, so keep the
    quality headroom)."""
    if quant_group >= 0:
        return quant_group
    # w8a8 per-column; w4a8 keeps 128 groups, now RANK-1 CONSTRAINED
    # (quant._rank1_scales): int4 quality needs grouped scales (measured
    # delta_w4a8_percol 10.8% vs delta_w4a8 3.1%, docs/QUALITY_r5.json),
    # and the rank-1 row (x) col factorization gives the large-M (prefill)
    # path a single native int8 dot anyway — the round-4 w4a8 prefill gap
    # closed without the per-column quality cost.
    return 0 if quant == "w8a8" else 128


def load_model(
    model: str,
    seed: int = 0,
    allow_random_init: bool = True,
    dtype=jnp.bfloat16,
    quant: str = "bf16",
    quant_group: int = -1,
) -> tuple[ModelSpec, dict]:
    """Resolve `model` (preset name or checkpoint dir) to (spec, params),
    already quantized per `quant` (bf16 | int8 | w8a8 | int4).

    "w8a8" stores the same int8 grouped weights as "int8" but additionally
    quantizes activations at runtime so the MXU runs native int8 (see
    ops/quant_matmul._w8a8_kernel).  quant_group: -1 auto, 0 per-column,
    else the scale group size (see resolve_quant_group)."""
    quant_bits = {
        "bf16": None, "int8": 8, "w8a8": 8, "int4": 4, "w4a8": 4,
    }[quant]
    act = "int8" if quant in ("w8a8", "w4a8") else "none"
    # w4a8's act changes the PACKING (column-planar biased, see
    # quant.quantize_weight), so it must reach the quantizers; w8a8 shares
    # the int8 weight format and the tag is runtime-only.
    pack_act = act if quant == "w4a8" else "none"
    group = resolve_quant_group(quant, quant_group)

    def tag(params):
        return _set_act_mode(params, act) if act != "none" else params

    if os.path.isdir(model):
        spec, params = load_hf_checkpoint(model, dtype=dtype)
        if quant_bits is not None:
            from caesar_tpu.engine.quant import quantize_params

            params = quantize_params(
                params, bits=quant_bits, group=group, act=pack_act
            )
            params = _maybe_quantize_head(
                spec, params, quant_bits, act=pack_act
            )
        return spec, tag(params)
    spec = MODEL_PRESETS.get(model)
    if spec is None:
        raise KeyError(
            f"{model!r} is neither a checkpoint directory nor a preset "
            f"({sorted(MODEL_PRESETS)})"
        )
    if not allow_random_init:
        raise FileNotFoundError(
            f"No checkpoint for {model!r} and allow_random_init=False"
        )
    if quant_bits is not None:
        # quantized preset: generate + quantize ON DEVICE — seconds, no disk
        # cache needed (the npz cache + host init path cost BENCH r1 a
        # 22-minute weights_load_s)
        try:
            return spec, tag(
                init_params_device(spec, seed=seed, quant_bits=quant_bits,
                                   quant_group=group, dtype=dtype,
                                   act=pack_act)
            )
        except Exception:
            pass  # fall through to the host path + cache
    # bf16 presets (and device-init failures): host init via the npz cache
    cache_path = _params_cache_path(
        model, "int8" if quant == "w8a8" else quant, seed, group
    )
    if cache_path is not None and cache_path.exists():
        try:
            return spec, tag(_load_params_cache(cache_path, dtype))
        except Exception:
            pass  # fall through to regeneration
    params = init_params(spec, seed=seed, dtype=dtype, quant_bits=quant_bits,
                         quant_group=group, act=pack_act)
    params = _maybe_quantize_head(spec, params, quant_bits, act=pack_act)
    if cache_path is not None:
        try:
            _save_params_cache(cache_path, params)
        except Exception:
            pass  # cache failures never break loading
    return spec, tag(params)
