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

from caesar_tpu.engine.model import ModelSpec, forward_cacheless
from caesar_tpu.engine.quant import quantize_params


def token_stream(tokenizer, texts: Iterable[str], max_len: int = 512) -> List[List[int]]:
    return [tokenizer.encode(t)[:max_len] for t in texts]


def perplexity(
    spec: ModelSpec, params: dict, token_ids: List[List[int]]
) -> float:
    """Mean per-token perplexity over the sequences (teacher-forced)."""
    total_nll = 0.0
    total_tokens = 0
    for ids in token_ids:
        if len(ids) < 2:
            continue
        tokens = jnp.asarray([ids], dtype=jnp.int32)
        logits = forward_cacheless(spec, params, tokens)[0]  # [T, vocab]
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
    return report
