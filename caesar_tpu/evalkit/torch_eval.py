"""Torch-CPU parity eval backend.

Capability parity with the reference's CUDA eval path (eval.py:48-115) for
torch-module problem files (Model as torch.nn.Module), evaluated on CPU —
the in-environment equivalent BASELINE.json designates on a TPU machine with
no NVIDIA toolchain.  Same result contract as the JAX backend.
"""

from __future__ import annotations

import time
import traceback
from typing import Any, Dict, List, Tuple

import numpy as np

from caesar_tpu.evalkit.result import KernelExecResult

_TOL = 1e-2
_HW_META = {"hardware": "cpu-torch", "device": "cpu"}


def _load_module(src: str, name: str) -> Dict[str, Any]:
    namespace: Dict[str, Any] = {"__name__": name, "__builtins__": __builtins__}
    exec(compile(src, f"<{name}>", "exec"), namespace)
    return namespace


def _build(namespace: Dict[str, Any], cls_name: str):
    import torch

    cls = namespace[cls_name]
    init_inputs = namespace["get_init_inputs"]()
    model = cls(*init_inputs)
    if isinstance(model, torch.nn.Module):
        model.eval()
    return model


def compile_kernel(kernel_src: str, ref_src: str = "", **_: object) -> Tuple[int, str, str]:
    """Build ModelNew and trace one forward on CPU."""
    import torch

    try:
        ref_ns = _load_module(ref_src, "reference_problem")
        torch.manual_seed(0)
        inputs = ref_ns["get_inputs"]()
        new_ns = _load_module(kernel_src, "generated_kernel")
        model_new = _build(new_ns, "ModelNew")
        with torch.no_grad():
            model_new(*inputs)
        return 0, "compiled ModelNew (torch cpu)", ""
    except Exception:
        return 1, "", traceback.format_exc(limit=16)


def evaluate_kernel(
    ref_src: str,
    kernel_src: str,
    num_correct_trials: int = 5,
    num_perf_trials: int = 100,
    measure_performance: bool = True,
    seed: int = 42,
    **_: object,
) -> KernelExecResult:
    import torch

    try:
        torch.manual_seed(seed)
        np.random.seed(seed)
        ref_ns = _load_module(ref_src, "reference_problem")
        model_ref = _build(ref_ns, "Model")
        torch.manual_seed(seed)
        np.random.seed(seed)
        new_ns = _load_module(kernel_src, "generated_kernel")
        model_new = _build(new_ns, "ModelNew")
    except Exception as e:
        return KernelExecResult(
            compiled=False,
            correctness=False,
            metadata={"compiler_error": f"failed to build ModelNew: {e}", **_HW_META},
        )

    get_inputs = ref_ns["get_inputs"]

    try:
        with torch.no_grad():
            for trial in range(num_correct_trials):
                torch.manual_seed(seed + trial)
                np.random.seed(seed + trial)
                inputs = get_inputs()
                expected = model_ref(*inputs)
                got = model_new(*inputs)
                e_arr = expected.detach().cpu().numpy()
                g_arr = got.detach().cpu().numpy()
                if e_arr.shape != g_arr.shape:
                    return KernelExecResult(
                        compiled=True,
                        correctness=False,
                        metadata={
                            "correctness_issue": (
                                f"Output shape mismatch: expected {e_arr.shape}, "
                                f"got {g_arr.shape}"
                            ),
                            **_HW_META,
                        },
                    )
                if not np.allclose(e_arr, g_arr, atol=_TOL, rtol=_TOL, equal_nan=True):
                    max_diff = float(np.max(np.abs(e_arr.astype(np.float64) - g_arr)))
                    return KernelExecResult(
                        compiled=True,
                        correctness=False,
                        metadata={
                            "correctness_issue": (
                                f"Output value mismatch on trial {trial}: max abs "
                                f"diff {max_diff:.6g} exceeds tolerance {_TOL}"
                            ),
                            **_HW_META,
                        },
                    )
    except Exception as e:
        return KernelExecResult(
            compiled=True,
            correctness=False,
            metadata={"runtime_error": f"{type(e).__name__}: {e}", **_HW_META},
        )

    if not measure_performance:
        return KernelExecResult(compiled=True, correctness=True, metadata=dict(_HW_META))

    try:
        with torch.no_grad():
            torch.manual_seed(seed)
            np.random.seed(seed)
            inputs = get_inputs()
            model_new(*inputs)  # warmup
            times_ms: List[float] = []
            for _ in range(num_perf_trials):
                t0 = time.perf_counter()
                model_new(*inputs)
                times_ms.append((time.perf_counter() - t0) * 1e3)
        arr = np.asarray(times_ms)
        stats = {
            "mean": float(arr.mean()),
            "std": float(arr.std()),
            "min": float(arr.min()),
            "max": float(arr.max()),
            "p50": float(np.percentile(arr, 50)),
            "num_trials": int(num_perf_trials),
            **_HW_META,
        }
        return KernelExecResult(
            compiled=True,
            correctness=True,
            metadata=dict(_HW_META),
            runtime=stats["mean"],
            runtime_stats=stats,
        )
    except Exception as e:
        return KernelExecResult(
            compiled=True,
            correctness=True,
            metadata={"runtime_error": f"timing failed: {e}", **_HW_META},
        )


def profile_kernel(
    ref_src: str,
    kernel_src: str,
    num_trials: int = 100,
    table_op_limit: int = 10,
    seed: int = 42,
    **_: object,
) -> str:
    """torch.profiler CPU table (the reference used CUDA activity only,
    eval.py:191-200; CPU activity is the in-environment equivalent)."""
    import torch
    from torch.profiler import ProfilerActivity, profile

    torch.manual_seed(seed)
    np.random.seed(seed)
    ref_ns = _load_module(ref_src, "reference_problem")
    torch.manual_seed(seed)
    np.random.seed(seed)
    new_ns = _load_module(kernel_src, "generated_kernel")
    model_new = _build(new_ns, "ModelNew")
    inputs = ref_ns["get_inputs"]()

    with torch.no_grad():
        schedule = torch.profiler.schedule(
            skip_first=2, wait=2, warmup=3, active=num_trials
        )
        with profile(activities=[ProfilerActivity.CPU], schedule=schedule) as prof:
            for _i in range(num_trials):
                model_new(*inputs)
                prof.step()
        return prof.key_averages().table(
            sort_by="cpu_time_total", row_limit=table_op_limit
        )
