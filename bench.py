"""Headline benchmark: decode tokens/s/chip for the quantized serving engine.

Runs the continuous-batching engine (BASELINE.json config-3 shape: 7B INT8,
concurrent trajectories on one chip) with random-init weights — identical
compute/memory paths to a real checkpoint — and reports steady-state decode
throughput.

Prints ONE JSON line:
    {"metric": "decode_tokens_per_s_per_chip_7b_int8", "value": ...,
     "unit": "tokens/s/chip", "vs_baseline": ...}

vs_baseline is the fraction of the chip's speed-of-light decode throughput
(the reference publishes no numbers — BASELINE.md; speed-of-light =
HBM-bandwidth-bound weight streaming at this batch size, the physical
ceiling for autoregressive decode):

    ceiling_tokens_per_s = batch * HBM_BW / bytes_read_per_step
    bytes_read_per_step  = quantized linear weights + bf16 lm head
                           + KV pages touched by the batch

Environment knobs: CAESAR_BENCH_MODEL (default qwen2.5-coder-7b),
CAESAR_BENCH_QUANT (int8), CAESAR_BENCH_BATCH (32), CAESAR_BENCH_TOKENS
(128 per sequence), CAESAR_BENCH_PROMPT (256).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    # defaults = the fastest shipped config at the bench context: w8a8
    # native-int8 MXU matmuls + bf16 KV.  FP8 KV (BASELINE config 4) is
    # within ~6% here and wins at long context (step probe, docs/ENGINE.md);
    # select it with CAESAR_BENCH_KV=fp8.
    model = os.environ.get("CAESAR_BENCH_MODEL", "qwen2.5-coder-7b")
    quant = os.environ.get("CAESAR_BENCH_QUANT", "w8a8")
    kv_quant = os.environ.get("CAESAR_BENCH_KV", "bf16")
    batch = int(os.environ.get("CAESAR_BENCH_BATCH", "32"))
    max_tokens = int(os.environ.get("CAESAR_BENCH_TOKENS", "128"))
    prompt_len = int(os.environ.get("CAESAR_BENCH_PROMPT", "256"))
    page_size = int(os.environ.get("CAESAR_BENCH_PAGE", "64"))
    # page-aligned chunk sized to the prompt: a 512 default pads 256-token
    # prompts to twice the work (prefill is one weight pass per chunk)
    prefill_chunk = int(
        os.environ.get(
            "CAESAR_BENCH_PREFILL_CHUNK",
            max(page_size, -(-prompt_len // page_size) * page_size),
        )
    )

    import jax

    from caesar_tpu.config import EngineConfig
    from caesar_tpu.engine.engine import Engine, EngineStats
    from caesar_tpu.evalkit.devinfo import peaks_for_device
    from caesar_tpu.harness.generate import GenerateRequest

    econf = EngineConfig(
        model=model,
        quant=quant,
        kv_quant=kv_quant,
        page_size=page_size,
        max_batch=batch,
        max_seq_len=2048,
        prefill_chunk=prefill_chunk,
        prefix_cache=False,  # measure raw decode, not cache hits
        seed=0,
    )
    t0 = time.monotonic()
    engine = Engine(
        econf,
        decode_steps=int(os.environ.get("CAESAR_BENCH_DECODE_STEPS", "32")),
    )
    load_s = time.monotonic() - t0
    spec = engine.spec

    rng_texts = [
        " ".join(f"w{i}t{j}" for j in range(prompt_len // 5))
        for i in range(batch)
    ]

    def run(n: int, tokens: int):
        futures = [
            engine.submit(
                GenerateRequest(
                    prompt=rng_texts[i % batch],
                    temperature=0.0,
                    max_tokens=tokens,
                    trajectory_id=f"bench-{i}",
                )
            )
            for i in range(n)
        ]
        for f in futures:
            f.result(timeout=3600)

    # warmup: compile prefill + decode graphs.  Prompts tokenize to slightly
    # different lengths; ones spilling past prefill_chunk hit a LARGER
    # power-of-two gather window (engine._prefill_one_chunk) — submit the
    # longest prompt too so every window bucket the measured run touches is
    # compiled here, not mid-measurement.
    t0 = time.monotonic()
    longest = max(
        range(batch), key=lambda i: len(engine.tokenizer.encode(rng_texts[i]))
    )
    futs = [
        engine.submit(
            GenerateRequest(
                prompt=rng_texts[i], temperature=0.0, max_tokens=8,
                trajectory_id=f"warmup-{i}",
            )
        )
        for i in (0, longest)
    ]
    for f in futs:
        f.result(timeout=3600)
    warmup_s = time.monotonic() - t0

    engine.reset_stats()  # scheduler thread swaps at its loop boundary
    t0 = time.monotonic()
    run(batch, max_tokens)
    wall_s = time.monotonic() - t0

    stats = engine.stats.snapshot(engine.prefix_cache)
    decode_tps = stats["decode_tokens_per_s"]
    prefill_tps = (
        stats["prefill_tokens"] / stats["prefill_time_s"]
        if stats["prefill_time_s"]
        else 0.0
    )

    # speed-of-light ceiling: bytes streamed per decode step
    device = jax.devices()[0]
    peaks = peaks_for_device(device)
    bytes_per_w = {"bf16": 2.0, "int8": 1.0, "w8a8": 1.0, "int4": 0.5}[quant]
    per_layer_lin = (
        spec.dim * (spec.q_dim + 2 * spec.kv_dim)
        + spec.q_dim * spec.dim
        + 3 * spec.dim * spec.hidden
    )
    linear_bytes = per_layer_lin * spec.n_layers * bytes_per_w
    # lm head bytes from its ACTUAL representation (quantized when the vocab
    # tiles; bf16 otherwise / tied embeddings)
    from caesar_tpu.engine.quant import QuantizedLinear

    head = engine.params.get("unembed", engine.params["embed"])
    if isinstance(head, QuantizedLinear):
        head_bytes = head.qweight.size + head.scales.size * 2
    else:
        head_bytes = head.size * head.dtype.itemsize
    kv_el = {"bf16": 2, "fp8": 1, "f32": 4}[kv_quant]
    mean_ctx = prompt_len + max_tokens / 2
    kv_bytes = (
        stats["mean_decode_batch"]
        * mean_ctx
        * spec.n_layers
        * 2
        * spec.kv_dim
        * kv_el
    )
    step_bytes = linear_bytes + head_bytes + kv_bytes
    ceiling_tps = stats["mean_decode_batch"] * peaks.hbm_bw / step_bytes

    result = {
        "metric": f"decode_tokens_per_s_per_chip_{model}_{quant}",
        "value": round(decode_tps, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(decode_tps / ceiling_tps, 4) if ceiling_tps else 0.0,
        "extras": {
            "device": getattr(device, "device_kind", str(device)),
            "model": model,
            "quant": quant,
            "kv_quant": kv_quant,
            "batch": batch,
            "mean_decode_batch": round(stats["mean_decode_batch"], 2),
            "prefill_tokens_per_s": round(prefill_tps, 1),
            "decode_tokens": stats["decode_tokens"],
            "speed_of_light_tokens_per_s": round(ceiling_tps, 1),
            "wall_s": round(wall_s, 2),
            "warmup_s": round(warmup_s, 2),
            "weights_load_s": round(load_s, 2),
            "completed": stats["completed"],
        },
    }
    engine.close()
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
