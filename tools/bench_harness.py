"""Trajectory-throughput benchmark: concurrent vs sequential harness runs.

BASELINE.json's second headline: ">=8x trajectory throughput vs sequential
API calls".  Runs the SAME sweep (engine generation + mock eval) twice:

  sequential — num_workers=1: each trajectory's turns run alone, the decode
               batch holds one sequence (the reference's blocking
               one-call-at-a-time shape);
  concurrent — num_workers=N: all trajectories multiplexed onto the engine's
               continuous batch.

Prints one JSON line with both rates and the speedup.

    python tools/bench_harness.py [model] [workers]

Env knobs (config-3 shape = defaults at 7B):
    CAESAR_HB_QUANT    weight quant (default w8a8 for 7B, bf16 otherwise)
    CAESAR_HB_SAMPLES  samples per problem (default 5 -> 50 trajectories
                       over the 10-problem level-1 subset)
    CAESAR_HB_MAXK     turns per trajectory (default 3)
    CAESAR_HB_TOKENS   max new tokens per turn (default 128)
    CAESAR_HB_DATASET  dataset name (default kernelbench-tpu/level1-subset;
                       the BASELINE-defined shape is kernelbench-tpu/level2)
    CAESAR_HB_EVAL     eval backend: mock | jax (real sandboxed CPU eval —
                       the shape BASELINE's trajectories/hour is defined at)
    CAESAR_HB_EVAL_WORKERS  concurrent eval sandboxes (default 2 host cores)
    CAESAR_HB_SEQ_TRAJ pin the SEQUENTIAL leg to this many trajectories
                       (sequential per-trajectory time is constant, so its
                       rate extrapolates; the full sequential level-2 sweep
                       would run for hours)
The engine shapes (max_batch 48, max_seq_len 2048, chunk 512) match
bench.py so the persistent compile cache carries over.
"""

from __future__ import annotations

import asyncio
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_sweep(
    model: str, workers: int, tmp: str, tag: str,
    samples: int | None = None, max_k: int | None = None,
    limit_trajectories: int | None = None,
) -> dict:
    from caesar_tpu.config import RunConfig
    from caesar_tpu.harness.driver import run_all
    from caesar_tpu.harness.generate import make_generator

    cfg = RunConfig()
    cfg.run_group = "bench"
    cfg.run_name = tag
    cfg.prompt_strategy = [
        "SHOW_INLINE_SYNTAX",
        "COMPILER_FEEDBACK",
        "CORRECTNESS_FEEDBACK",
        "PROFILER_FEEDBACK",
    ]
    cfg.backend = "engine"
    cfg.eval_backend = os.environ.get("CAESAR_HB_EVAL", "mock")
    cfg.eval_workers = int(os.environ.get("CAESAR_HB_EVAL_WORKERS", "2"))
    cfg.dataset_name = os.environ.get(
        "CAESAR_HB_DATASET", "kernelbench-tpu/level1-subset"
    )
    cfg.num_samples = samples or int(os.environ.get("CAESAR_HB_SAMPLES", "5"))
    cfg.max_k = max_k or int(os.environ.get("CAESAR_HB_MAXK", "3"))
    cfg.max_tokens = int(os.environ.get("CAESAR_HB_TOKENS", "128"))
    cfg.greedy_sample = True
    cfg.num_workers = workers
    cfg.log_dir_prefix = os.path.join(tmp, tag, "logs")
    cfg.build_dir_prefix = os.path.join(tmp, tag, "build")
    cfg.engine.model = model
    cfg.engine.quant = os.environ.get(
        "CAESAR_HB_QUANT", "w8a8" if "7b" in model else "bf16"
    )
    cfg.engine.max_batch = max(2, min(workers, 48))
    # shapes matching bench.py: the persistent compile cache carries over.
    # CAESAR_HB_MAXSEQ=4096 + CAESAR_HB_KV=fp8 is the long-prompt escape
    # hatch (turn-10 level-2 prompts; fp8 halves the pool so 4k ctx fits)
    cfg.engine.max_seq_len = int(os.environ.get("CAESAR_HB_MAXSEQ", "2048"))
    cfg.engine.kv_quant = os.environ.get("CAESAR_HB_KV", "bf16")
    cfg.engine.prefill_chunk = 512
    if limit_trajectories:
        cfg.limit_trajectories = limit_trajectories
    cfg.finalize()

    generator = make_generator(cfg)
    try:
        t0 = time.monotonic()
        stats = asyncio.run(run_all(cfg, generator=generator, progress_interval=0))
        stats["wall_s"] = time.monotonic() - t0
        engines = getattr(generator, "engines", [])
        if engines:
            stats["engine"] = engines[0].stats.snapshot(engines[0].prefix_cache)
        return stats
    finally:
        asyncio.run(generator.close())


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "qwen2.5-coder-1.5b"
    workers = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    tmp = tempfile.mkdtemp(prefix="caesar_bench_")
    try:
        # untimed warmup legs: compile every prefill row/window bucket and
        # BOTH decode graphs (batch=48 and batch=2) before the clocks
        # start — the first cut of this tool ran the concurrent leg cold
        # and measured ~10 minutes of XLA compiles as "trajectory time".
        # max_k matches the timed legs so turn-3 prompt lengths (the
        # deepest window bucket) compile here, not in the measured span.
        seq_traj = int(os.environ.get("CAESAR_HB_SEQ_TRAJ", "0")) or None
        run_sweep(model, workers, tmp, "warm-conc", samples=1,
                  limit_trajectories=min(workers, 16))
        run_sweep(model, 1, tmp, "warm-seq", samples=1,
                  limit_trajectories=2)
        sequential = run_sweep(model, 1, tmp, "sequential",
                               limit_trajectories=seq_traj)
        concurrent = run_sweep(model, workers, tmp, "concurrent")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    conc_rate = concurrent["trajectories_per_hour"]
    seq_rate = sequential["trajectories_per_hour"]
    result = {
        "metric": f"trajectory_throughput_speedup_{model}",
        "value": round(conc_rate / seq_rate, 2) if seq_rate else 0.0,
        "unit": "x vs sequential",
        "vs_baseline": round(conc_rate / seq_rate / 8.0, 3) if seq_rate else 0.0,
        "extras": {
            "concurrent_trajectories_per_hour": round(conc_rate, 1),
            "sequential_trajectories_per_hour": round(seq_rate, 1),
            "dataset": os.environ.get(
                "CAESAR_HB_DATASET", "kernelbench-tpu/level1-subset"
            ),
            "eval_backend": os.environ.get("CAESAR_HB_EVAL", "mock"),
            "sequential_leg_trajectories": os.environ.get(
                "CAESAR_HB_SEQ_TRAJ", "all"
            ),
            "workers": workers,
            "p50_turn_latency_s_concurrent": concurrent.get("p50_turn_latency_s"),
            "p50_turn_latency_s_sequential": sequential.get("p50_turn_latency_s"),
            "prefix_hit_rate": concurrent.get("engine", {}).get(
                "prefix_hit_rate"
            ),
            "concurrent_engine": {
                k: round(v, 3) if isinstance(v, float) else v
                for k, v in concurrent.get("engine", {}).items()
            },
            "concurrent_wall_s": round(concurrent["wall_s"], 1),
            "sequential_wall_s": round(sequential["wall_s"], 1),
            "failed": len(concurrent["failed"]) + len(sequential["failed"]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
