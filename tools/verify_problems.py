"""Verify the generated problem corpus (round-5 VERDICT item 3).

For every problem file in problems/level{1,2,3}:

  1. run the reference Model on its own get_inputs() through the real
     evalkit jit path (the sandbox's compute), and
  2. check the canned mock solution — the ModelNew-subclass the harness's
     MockGenerator emits — compiles AND passes value parity through
     evalkit.jax_eval.evaluate_kernel.

Exit code 0 iff all problems pass.  Run CPU-only:

    JAX_PLATFORMS=cpu python tools/verify_problems.py [level]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# the axon sitecustomize force-updates jax_platforms at interpreter start;
# config-level override wins as long as no backend is initialized yet
jax.config.update("jax_platforms", "cpu")

from caesar_tpu.evalkit.dataset import ProblemDataset  # noqa: E402
from caesar_tpu.evalkit.jax_eval import evaluate_kernel  # noqa: E402


def mock_solution(arch_src: str) -> str:
    """The MockGenerator's canned kernel (harness/generate.py)."""
    return (
        arch_src
        + "\n\nclass ModelNew(Model):\n"
        + "    # mock solution\n"
        + "    pass\n"
    )


def main() -> int:
    levels = [int(sys.argv[1])] if len(sys.argv) > 1 else [1, 2, 3]
    root = os.path.join(os.path.dirname(__file__), "..", "problems")
    failures = []
    total = 0
    for level in levels:
        ds = ProblemDataset.from_dir(os.path.join(root, f"level{level}"))
        for pid in ds.get_problem_ids():
            path = ds.get_problem_path_by_id(pid)
            with open(path) as f:
                src = f.read()
            t0 = time.monotonic()
            result = evaluate_kernel(
                src, mock_solution(src),
                num_correct_trials=2, num_perf_trials=3,
                measure_performance=True,
            )
            dt = time.monotonic() - t0
            total += 1
            ok = result.compiled and result.correctness
            status = "ok" if ok else "FAIL"
            print(
                f"level{level} #{pid:3d} {os.path.basename(path):44s}"
                f" {status}  {dt:5.1f}s"
                + ("" if ok else f"  {result.metadata}"),
                flush=True,
            )
            if not ok:
                failures.append((level, pid, result.metadata))
    print(f"\n{total - len(failures)}/{total} problems verified")
    if failures:
        for level, pid, meta in failures:
            print(f"  FAILED level{level} #{pid}: {str(meta)[:200]}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
