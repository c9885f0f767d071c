"""Deterministic no-hardware eval backend.

The first-class "mock mode" the reference's scripts implied (mock=True in
scripts/run_caesar.sh and run_shuffle_kill.sh) but never wired into config
(SURVEY.md §4.2).  Everything is derived from the kernel source text: a
kernel "compiles" if it parses and defines ModelNew, is "correct" if it
additionally contains no MOCK_FAIL marker, and its "runtime" is a stable
function of the source digest — so full trajectories (including
best-vs-last-kernel prompt logic) exercise deterministically with zero
accelerators, matching BASELINE.json config 1.
"""

from __future__ import annotations

import ast

from caesar_tpu.evalkit.jax_eval import kernel_digest
from caesar_tpu.evalkit.result import KernelExecResult

#: magic markers tests can embed in kernel sources to force outcomes
FAIL_CORRECTNESS_MARKER = "MOCK_FAIL_CORRECTNESS"
FAIL_COMPILE_MARKER = "MOCK_FAIL_COMPILE"

_HW_META = {"hardware": "mock", "device": "mock:0"}


def _mock_runtime_ms(kernel_src: str) -> float:
    """Stable pseudo-runtime in [0.5, 2.5) ms derived from the source."""
    digest = int(kernel_digest(kernel_src)[:8], 16)
    return 0.5 + (digest % 2000) / 1000.0


def compile_kernel(kernel_src: str, ref_src: str = "", **_: object):
    if FAIL_COMPILE_MARKER in kernel_src:
        return 1, "", "mock: forced compile failure marker present"
    try:
        tree = ast.parse(kernel_src)
    except SyntaxError as e:
        return 1, "", f"SyntaxError: {e}"
    defines_model_new = any(
        isinstance(node, ast.ClassDef) and node.name == "ModelNew"
        for node in ast.walk(tree)
    )
    if not defines_model_new:
        return 1, "", "mock: generated source does not define class ModelNew"
    return 0, "mock: compiled", ""


def evaluate_kernel(
    ref_src: str,
    kernel_src: str,
    measure_performance: bool = True,
    **_: object,
) -> KernelExecResult:
    rc, _out, err = compile_kernel(kernel_src, ref_src)
    if rc != 0:
        return KernelExecResult(
            compiled=False,
            correctness=False,
            metadata={"compiler_error": err, **_HW_META},
        )
    if FAIL_CORRECTNESS_MARKER in kernel_src:
        return KernelExecResult(
            compiled=True,
            correctness=False,
            metadata={
                "correctness_issue": "mock: forced correctness failure marker",
                **_HW_META,
            },
        )
    runtime = _mock_runtime_ms(kernel_src) if measure_performance else -1.0
    stats = (
        {
            "mean": runtime,
            "std": 0.0,
            "min": runtime,
            "max": runtime,
            "p50": runtime,
            "num_trials": 1,
            **_HW_META,
        }
        if measure_performance
        else {}
    )
    return KernelExecResult(
        compiled=True,
        correctness=True,
        metadata=dict(_HW_META),
        runtime=runtime,
        runtime_stats=stats,
    )


def profile_kernel(ref_src: str, kernel_src: str, **_: object) -> str:
    runtime = _mock_runtime_ms(kernel_src)
    return (
        "Profiler report for ModelNew (mock backend)\n"
        "  trials: 1\n"
        f"  wall time per call: mean {runtime:.4f} ms\n"
        "  compute: n/a (mock)\n"
        "  HLO ops (top 1 by count):\n"
        "    mock                     x1\n"
    )
