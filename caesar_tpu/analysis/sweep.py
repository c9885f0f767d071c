"""Sweep analysis: fast_0 / fast_p vs turn budget across a run group.

The reference's analysis flow scored whole run groups turn-by-turn
(single_run_analysis.py main + run_caesar.sh's max_k sweep); this renders
the fast_p(k) curve for every run in a group:

    python -m caesar_tpu.analysis.sweep runs/logs/<group> \
        [--baseline baselines/x.json --level 1 --p 1.0] [--max-k 10]
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

from caesar_tpu.analysis.fastp import (
    compute_fast_0_for_run,
    compute_fast_p_for_run,
)


def sweep_group(
    group_path: str | os.PathLike,
    max_k: int = 10,
    baseline=None,
    level: int = 1,
    p: float = 1.0,
) -> dict:
    group_path = Path(group_path)
    out: dict = {"group": str(group_path), "runs": {}}
    for run_name in sorted(os.listdir(group_path)):
        run_path = group_path / run_name
        if not run_path.is_dir():
            continue
        curve = {}
        for k in range(1, max_k + 1):
            entry = {"fast0": compute_fast_0_for_run(run_path, k)}
            if baseline:
                entry[f"fast{p:g}"] = compute_fast_p_for_run(
                    run_path, baseline, level, k, p
                )
            curve[k] = entry
        out["runs"][run_name] = curve
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("group_path")
    parser.add_argument("--max-k", type=int, default=10)
    parser.add_argument("--baseline", default=None)
    parser.add_argument("--level", type=int, default=1)
    parser.add_argument("--p", type=float, default=1.0)
    args = parser.parse_args(argv)
    print(
        json.dumps(
            sweep_group(
                args.group_path, args.max_k, args.baseline, args.level, args.p
            ),
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
