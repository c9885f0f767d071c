"""Generate per-problem baseline timing tables for fast_p scoring.

Times every problem's reference Model (jit-compiled, as-shipped — the
"torch baseline" seat of the reference's analysis pipeline,
single_run_analysis.py:228) on the current backend and writes the
reference-shaped JSON:

    {"level1": {"23_Softmax": {"mean": ms, "std": ..., "min": ..., ...}}}

Usage:  python tools/gen_baselines.py --out baselines/<name>.json \
            [--levels 1 2 3] [--trials 20] [--platform cpu|tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--levels", type=int, nargs="+", default=[1, 2, 3])
    parser.add_argument("--trials", type=int, default=20)
    parser.add_argument("--platform", default="")
    args = parser.parse_args(argv)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        if args.platform == "cpu":
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import numpy as np
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from caesar_tpu.evalkit.dataset import resolve_dataset
    from caesar_tpu.evalkit import jax_eval

    table: dict = {}
    for level in args.levels:
        ds = resolve_dataset(f"kernelbench-tpu/level{level}")
        level_tbl: dict = {}
        for pid in ds.get_problem_ids():
            path = ds.get_problem_path_by_id(pid)
            name = os.path.basename(path)[: -len(".py")]
            src = open(path).read()
            try:
                jax_eval.set_seed(42)
                ns = jax_eval._load_module(src, f"baseline_{name}")
                model = jax_eval._build_model(ns, "Model")
                inputs = jax.device_put(ns["get_inputs"]())
                fn, _ = jax_eval._jitted_call(model, inputs, jax.devices()[0])
                jax.block_until_ready(fn(*inputs))  # warmup
                times = []
                for _ in range(args.trials):
                    t0 = time.perf_counter()
                    jax.block_until_ready(fn(*inputs))
                    times.append((time.perf_counter() - t0) * 1e3)
                arr = np.asarray(times)
                level_tbl[name] = {
                    "mean": float(arr.mean()),
                    "std": float(arr.std()),
                    "min": float(arr.min()),
                    "max": float(arr.max()),
                    "num_trials": args.trials,
                    "hardware": jax.devices()[0].device_kind,
                }
                print(f"level{level}/{name}: {arr.mean():.4f} ms")
            except Exception as e:
                print(f"level{level}/{name}: FAILED {e!r}", file=sys.stderr)
        table[f"level{level}"] = level_tbl

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
