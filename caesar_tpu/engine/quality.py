"""Quality-parity measurement: perplexity deltas across quantization levels.

BASELINE.json requires "perplexity/pass@k within the quant scheme's stated
delta at the same bit-width".  Without downloadable checkpoints the absolute
perplexity of random-init weights is meaningless, but the DELTA between the
bf16 model and its int8/int4 quantization of the *same* weights is exactly
the quant-degradation metric — and is what this module measures.  With a
real checkpoint directory the same functions produce true perplexity.

pass@k for the kernel-generation task is the harness's fast_0 (correctness
rate over samples, analysis/fastp.py) — quality parity there is a run-level
comparison between two engines' run trees.
"""

from __future__ import annotations

from typing import Dict, Iterable, List

import jax
import jax.numpy as jnp
import numpy as np

from caesar_tpu.engine import kvcache
from caesar_tpu.engine.model import (
    ModelSpec,
    attention_full,
    forward_cacheless,
    linear,
    mlp,
    qkv_project,
    rms_norm,
)
from caesar_tpu.engine.quant import quantize_params


def token_stream(tokenizer, texts: Iterable[str], max_len: int = 512) -> List[List[int]]:
    return [tokenizer.encode(t)[:max_len] for t in texts]


def forward_kv_rounded(
    spec: ModelSpec, params: dict, tokens: jax.Array, kv_quant: str
) -> jax.Array:
    """forward_cacheless with K/V round-tripped through the KV-pool storage
    dtype — isolates exactly the error the paged cache's storage format adds
    (engine serving stores K/V in kv_quant and upcasts on read; see
    kvcache.write_chunk/gather_kv)."""
    storage = kvcache.kv_dtype(kv_quant)
    b, t = tokens.shape
    x = params["embed"][tokens]
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    for layer in params["layers"]:
        h = rms_norm(x, layer["ln_attn"], spec.rms_eps)
        q, k, v = qkv_project(spec, layer, h, positions)
        k = k.astype(storage).astype(k.dtype)  # the pool write/read pair
        v = v.astype(storage).astype(v.dtype)
        attn = attention_full(q, k, v)
        x = x + linear(attn.reshape(b, t, spec.q_dim), layer["wo"])
        h = rms_norm(x, layer["ln_mlp"], spec.rms_eps)
        x = x + mlp(layer["mlp"], h)
    x = rms_norm(x, params["ln_out"], spec.rms_eps)
    if spec.tie_embeddings:
        return jnp.dot(x, params["embed"].T, preferred_element_type=jnp.float32)
    return linear(x, params["unembed"]).astype(jnp.float32)


def perplexity(
    spec: ModelSpec,
    params: dict,
    token_ids: List[List[int]],
    forward=forward_cacheless,
) -> float:
    """Mean per-token perplexity over the sequences (teacher-forced)."""
    total_nll = 0.0
    total_tokens = 0
    for ids in token_ids:
        if len(ids) < 2:
            continue
        tokens = jnp.asarray([ids], dtype=jnp.int32)
        logits = forward(spec, params, tokens)[0]  # [T, vocab]
        logprobs = jax.nn.log_softmax(logits[:-1], axis=-1)
        targets = tokens[0, 1:]
        nll = -jnp.take_along_axis(logprobs, targets[:, None], axis=-1)
        total_nll += float(jnp.sum(nll))
        total_tokens += len(ids) - 1
    if total_tokens == 0:
        return float("nan")
    return float(np.exp(total_nll / total_tokens))


def quant_quality_report(
    spec: ModelSpec,
    params: dict,
    token_ids: List[List[int]],
    bits_list=(8, 4),
    group: int = 128,
    include_w8a8: bool = True,
) -> Dict[str, float]:
    """Perplexity of the dense model and each quantization of it, plus
    relative deltas — the quality-parity scorecard.

    w8a8 (int8 weights + runtime per-token int8 activations, the fastest
    serving mode) is scored alongside the weight-only schemes so its extra
    activation-quant error is an explicit line item.
    """
    report: Dict[str, float] = {}
    base = perplexity(spec, params, token_ids)
    report["ppl_bf16"] = base
    for bits in bits_list:
        q_params = quantize_params(params, bits=bits, group=group)
        ppl = perplexity(spec, q_params, token_ids)
        report[f"ppl_int{bits}"] = ppl
        report[f"delta_int{bits}"] = (ppl - base) / base
        if bits == 8 and include_w8a8:
            a8_params = quantize_params(
                params, bits=8, group=group, act="int8"
            )
            ppl8a8 = perplexity(spec, a8_params, token_ids)
            report["ppl_w8a8"] = ppl8a8
            report["delta_w8a8"] = (ppl8a8 - base) / base
            # per-column scales are w8a8's serving default
            # (weights.resolve_quant_group): score the coarser scale
            # granularity as its own line item
            pc_params = quantize_params(params, bits=8, group=0, act="int8")
            ppl_pc = perplexity(spec, pc_params, token_ids)
            report["ppl_w8a8_percol"] = ppl_pc
            report["delta_w8a8_percol"] = (ppl_pc - base) / base
        if bits == 4:
            # w4a8 (int4 weights + int8 activations + nibble-bias rowsum
            # correction) — round 4's best-decode config, previously
            # served with an unmeasured quality delta (round-4 VERDICT
            # missing item 5).  Default = free grouped scales; the rank-1
            # (prefill-fast, opt-in) and per-column variants are scored
            # as their own line items.
            w4a8_params = quantize_params(
                params, bits=4, group=group, act="int8"
            )
            ppl48 = perplexity(spec, w4a8_params, token_ids)
            report["ppl_w4a8"] = ppl48
            report["delta_w4a8"] = (ppl48 - base) / base
            r1_params = quantize_params(
                params, bits=4, group=group, act="int8", rank1=True
            )
            ppl48r = perplexity(spec, r1_params, token_ids)
            report["ppl_w4a8_rank1"] = ppl48r
            report["delta_w4a8_rank1"] = (ppl48r - base) / base
            pc4_params = quantize_params(params, bits=4, group=0, act="int8")
            ppl48pc = perplexity(spec, pc4_params, token_ids)
            report["ppl_w4a8_percol"] = ppl48pc
            report["delta_w4a8_percol"] = (ppl48pc - base) / base
    return report


def kv_quality_report(
    spec: ModelSpec,
    params: dict,
    token_ids: List[List[int]],
    kv_quants=("bf16", "fp8"),
) -> Dict[str, float]:
    """Perplexity with K/V rounded through each KV-pool storage dtype vs the
    unrounded model — the BASELINE config-4 FP8-KV quality line item."""
    report: Dict[str, float] = {}
    base = perplexity(spec, params, token_ids)
    report["ppl_kv_full"] = base
    for kv in kv_quants:
        fwd = lambda s, p, t, kv=kv: forward_kv_rounded(s, p, t, kv)  # noqa: E731
        ppl = perplexity(spec, params, token_ids, forward=fwd)
        report[f"ppl_kv_{kv}"] = ppl
        report[f"delta_kv_{kv}"] = (ppl - base) / base
    return report
