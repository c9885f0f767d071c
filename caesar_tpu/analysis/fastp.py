"""fast_p scoring: the KernelBench paper metric.

fast_p = fraction of problems for which some turn in 1..k produced a CORRECT
kernel whose speedup over the per-problem baseline exceeds p
(reference analysis/single_run_analysis.py:160-186 and the external
utils.score.fastp contract; fast_0 with p=0 degenerates to the correctness
rate, analysis/single_run_analysis_fast0.py:205-206).

Run logs are the per-trajectory journals (problem_<id>/sample_<id>/log.json);
the per-problem best runtime over the first k turns mirrors the reference's
get_best_solution / get_overall_runtime (-1/None = incorrect,
analysis/single_run_analysis.py:111-158).  Baseline timing tables are JSON
of the reference shape {"level1": {"23_Softmax": {"mean": ms, ...}}}
(utils.py:217-244 in the reference).
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Dict, List, Optional, Sequence


def fastp(
    is_correct: Sequence[bool],
    baseline_speed: Sequence[float],
    actual_speed: Sequence[float],
    n: int,
    p: float,
) -> float:
    """fraction of the n problems that are correct AND >p-times faster than
    baseline (speedup = baseline/actual, strictly greater than p)."""
    if n <= 0:
        return 0.0
    score = 0
    for ok, base, actual in zip(is_correct, baseline_speed, actual_speed):
        if not ok:
            continue
        if actual is None or actual <= 0:
            continue
        if base / actual > p:
            score += 1
    return score / n


# ----------------------------------------------------------------------
# run-log plumbing
# ----------------------------------------------------------------------


def load_sample_log(sample_dir: str | os.PathLike) -> Optional[dict]:
    path = Path(sample_dir) / "log.json"
    if not path.exists():
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except json.JSONDecodeError:
        return None


def best_runtime_up_to_k(log: dict, k: int) -> Optional[float]:
    """Best (min) runtime among correct turns 1..k; None if no correct turn
    (reference get_best_solution semantics, single_run_analysis.py:111-126:
    runtime -1 / missing eval = incorrect)."""
    best: Optional[float] = None
    for turn in range(1, k + 1):
        turn_data = log.get(str(turn)) or log.get(turn)
        if not turn_data:
            continue
        ev = turn_data.get("eval_result")
        if not isinstance(ev, dict) or not ev:
            continue
        if not (ev.get("compiled") and ev.get("correctness")):
            continue
        runtime = ev.get("runtime", -1)
        if runtime is None or runtime == -1:
            continue
        if best is None or runtime < best:
            best = runtime
    return best


def iter_problem_dirs(run_path: str | os.PathLike):
    run_path = Path(run_path)
    for entry in sorted(os.listdir(run_path)):
        m = re.match(r"problem_(\d+)$", entry)
        if m and (run_path / entry).is_dir():
            yield int(m.group(1)), run_path / entry


def iter_sample_dirs(problem_dir: Path):
    for entry in sorted(os.listdir(problem_dir)):
        m = re.match(r"sample_(\d+)$", entry)
        if m and (problem_dir / entry).is_dir():
            yield int(m.group(1)), problem_dir / entry


def collect_run(run_path: str | os.PathLike, k: int) -> Dict[int, Optional[float]]:
    """Per-problem best runtime over all samples' first k turns."""
    out: Dict[int, Optional[float]] = {}
    for problem_id, problem_dir in iter_problem_dirs(run_path):
        best: Optional[float] = None
        for _sample_id, sample_dir in iter_sample_dirs(problem_dir):
            log = load_sample_log(sample_dir)
            if log is None:
                continue
            runtime = best_runtime_up_to_k(log, k)
            if runtime is not None and (best is None or runtime < best):
                best = runtime
        out[problem_id] = best
    return out


# ----------------------------------------------------------------------
# baseline tables
# ----------------------------------------------------------------------


def fetch_baseline_ms(
    baseline_file: str | os.PathLike, level: int, problem_id: int
) -> Optional[float]:
    """Look up a problem's baseline mean ms (reference
    fetch_baseline_time_by_problem_id, utils.py:217-244 — matched on the
    numeric prefix of the problem name)."""
    with open(baseline_file) as f:
        table = json.load(f)
    level_tbl = table.get(f"level{level}", {})
    for name, entry in level_tbl.items():
        if name.split("_")[0] == str(problem_id):
            if isinstance(entry, dict):
                return entry.get("mean")
            return float(entry)
    return None


# ----------------------------------------------------------------------
# top-level scores
# ----------------------------------------------------------------------


def compute_fast_p_for_run(
    run_path: str | os.PathLike,
    baseline_file: str | os.PathLike,
    level: int,
    k: int,
    p: float,
) -> float:
    per_problem = collect_run(run_path, k)
    is_correct: List[bool] = []
    baselines: List[float] = []
    actuals: List[float] = []
    n = 0
    for problem_id, runtime in sorted(per_problem.items()):
        baseline = fetch_baseline_ms(baseline_file, level, problem_id)
        if baseline is None:
            continue  # problems without baseline data are excluded
        n += 1
        is_correct.append(runtime is not None)
        baselines.append(baseline)
        actuals.append(runtime if runtime is not None else -1.0)
    return fastp(is_correct, baselines, actuals, n, p)


def compute_fast_0_for_run(run_path: str | os.PathLike, k: int) -> float:
    """Correctness rate over problems (p=0, no baseline needed)."""
    per_problem = collect_run(run_path, k)
    if not per_problem:
        return 0.0
    correct = sum(1 for r in per_problem.values() if r is not None)
    return correct / len(per_problem)


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description="fast_p scoring over a run")
    parser.add_argument("run_path", help="runs/logs/<group>/<name> directory")
    parser.add_argument("--baseline", help="baseline timing JSON", default=None)
    parser.add_argument("--level", type=int, default=1)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--p", type=float, default=1.0)
    args = parser.parse_args(argv)

    fast0 = compute_fast_0_for_run(args.run_path, args.k)
    print(f"fast_0 (correctness rate, k={args.k}): {fast0:.4f}")
    if args.baseline:
        score = compute_fast_p_for_run(
            args.run_path, args.baseline, args.level, args.k, args.p
        )
        print(f"fast_{args.p:g} (k={args.k}): {score:.4f}")


if __name__ == "__main__":
    main()
