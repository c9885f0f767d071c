"""Run-vs-run comparison: quality parity between two engines/configs.

BASELINE.json's quality gate is run-level: "match the reference model's
perplexity/pass@k within the quant scheme's stated delta".  For the
kernel-generation task, pass@k is fast_0 over samples and fast_p is the
speed-quality curve; this tool diffs them between two run trees (e.g. a
bf16 engine run vs the int8 run of the same sweep).

Usage:
    python -m caesar_tpu.analysis.compare runs/logs/g/bf16 runs/logs/g/int8 \
        --k 10 [--baseline baselines/x.json --level 1 --p 1.0]
"""

from __future__ import annotations

import argparse
import json

from caesar_tpu.analysis.fastp import (
    collect_run,
    compute_fast_0_for_run,
    compute_fast_p_for_run,
)


def compare_runs(run_a: str, run_b: str, k: int, baseline=None, level=1, p=1.0) -> dict:
    out = {
        "run_a": str(run_a),
        "run_b": str(run_b),
        "k": k,
        "fast0_a": compute_fast_0_for_run(run_a, k),
        "fast0_b": compute_fast_0_for_run(run_b, k),
    }
    out["fast0_delta"] = out["fast0_b"] - out["fast0_a"]
    if baseline:
        out["fastp_a"] = compute_fast_p_for_run(run_a, baseline, level, k, p)
        out["fastp_b"] = compute_fast_p_for_run(run_b, baseline, level, k, p)
        out["fastp_delta"] = out["fastp_b"] - out["fastp_a"]

    per_a = collect_run(run_a, k)
    per_b = collect_run(run_b, k)
    diffs = []
    for pid in sorted(set(per_a) & set(per_b)):
        a, b = per_a[pid], per_b[pid]
        if (a is None) != (b is None):
            diffs.append(
                {"problem": pid, "a": a, "b": b, "kind": "correctness_flip"}
            )
        elif a is not None and b is not None and min(a, b) > 0:
            ratio = b / a
            if ratio > 1.25 or ratio < 0.8:
                diffs.append(
                    {"problem": pid, "a": a, "b": b, "kind": "runtime_shift",
                     "ratio": round(ratio, 3)}
                )
    out["notable_diffs"] = diffs
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("run_a")
    parser.add_argument("run_b")
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--baseline", default=None)
    parser.add_argument("--level", type=int, default=1)
    parser.add_argument("--p", type=float, default=1.0)
    args = parser.parse_args(argv)
    print(
        json.dumps(
            compare_runs(
                args.run_a, args.run_b, args.k, args.baseline, args.level, args.p
            ),
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
