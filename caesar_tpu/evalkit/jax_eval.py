"""JAX-native kernel-eval sandbox: compile, correctness, profile.

The TPU-native equivalent of the reference's eval wrappers (eval.py:18-201),
operating on JAX problem files (Model / get_inputs / get_init_inputs) and
LLM-generated ModelNew sources (plain JAX and/or Pallas kernels):

* ``compile``     — exec the generated source, build ModelNew, and jit-lower +
                    compile its __call__ for the eval device.  Trace/compile
                    errors are the TPU analogue of nvcc failures
                    (reference eval.py:18-45).
* ``evaluate``    — randomized-input value-parity check against the reference
                    Model over num_correct_trials, then timed runs over
                    num_perf_trials (reference eval.py:48-115 contract:
                    error classification lands in KernelExecResult.metadata,
                    runtime in ms, -1.0 when invalid).
* ``profile``     — a deterministic profiler table: timing distribution, XLA
                    cost analysis (FLOPs / bytes), achieved rates vs device
                    peaks, and an HLO op histogram.  Stands in the prompt seat
                    the reference's torch.profiler table occupied
                    (eval.py:138-201); the seat is just a string
                    (turn_info.py:13 in the reference).

Each call normally runs inside a fresh subprocess (see subproc.py) so a
crashing or leaking generated kernel cannot poison the host — the same
isolation the reference got from one mp.Process per eval
(state_machine.py:327-342).

Build caching: compiled executables are cached under
``build_dir/<sha256(kernel_src)>`` via JAX's persistent compilation cache —
a content digest, deliberately not Python's per-process-salted hash()
(reference defect, eval.py:14-15, SURVEY.md §5.4).
"""

from __future__ import annotations

import hashlib
import os
import time
import traceback
from typing import Any, Dict, List, Tuple

import numpy as np

from caesar_tpu.evalkit.result import KernelExecResult

_DEFAULT_TOL = 1e-2  # KernelBench-style value-parity tolerance


def kernel_digest(kernel_src: str) -> str:
    """Stable content digest used as the build-cache key."""
    return hashlib.sha256(kernel_src.encode("utf-8")).hexdigest()[:24]


def set_seed(seed: int) -> None:
    np.random.seed(seed)


def _load_module(src: str, name: str) -> Dict[str, Any]:
    """Exec a problem/kernel source string into a fresh namespace."""
    namespace: Dict[str, Any] = {"__name__": name, "__builtins__": __builtins__}
    code = compile(src, f"<{name}>", "exec")
    exec(code, namespace)
    return namespace


def _require(namespace: Dict[str, Any], symbol: str, what: str) -> Any:
    if symbol not in namespace:
        raise NameError(f"{what} source does not define {symbol!r}")
    return namespace[symbol]


def _device(device_str: str = ""):
    import jax

    if device_str:
        platform, _, idx = device_str.partition(":")
        devs = jax.devices(platform)
        return devs[int(idx) if idx else 0]
    return jax.devices()[0]


def _build_model(
    namespace: Dict[str, Any],
    cls_name: str,
    fallback_ns: Dict[str, Any] | None = None,
):
    """Instantiate a model class with its get_init_inputs().

    Generated ModelNew sources need not re-declare get_init_inputs; the
    reference problem's is used then (matching the reference eval, which
    always takes init inputs from the original model source,
    eval.py:158-178)."""
    model_cls = _require(namespace, cls_name, cls_name)
    if "get_init_inputs" in namespace:
        get_init_inputs = namespace["get_init_inputs"]
    elif fallback_ns is not None and "get_init_inputs" in fallback_ns:
        get_init_inputs = fallback_ns["get_init_inputs"]
    else:
        get_init_inputs = _require(namespace, "get_init_inputs", cls_name)
    return model_cls(*get_init_inputs())


def _jitted_call(model, inputs: List[Any], device):
    """jit-compile model.__call__ on `device`; returns (compiled_fn, lowered).

    The compile target follows the inputs' placement, so callers device_put
    the inputs onto `device` first; default_device covers closed-over
    constants created inside the model."""
    import jax

    with jax.default_device(device):
        fn = jax.jit(lambda *args: model(*args))
        lowered = fn.lower(*inputs)
        compiled = lowered.compile()
    return compiled, lowered


def _enable_build_cache(build_dir: str, kernel_src: str) -> None:
    if not build_dir:
        return
    cache_dir = os.path.join(build_dir, kernel_digest(kernel_src))
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# ----------------------------------------------------------------------
def compile_kernel(
    kernel_src: str,
    ref_src: str,
    build_dir: str = "",
    device_str: str = "",
) -> Tuple[int, str, str]:
    """Build + jit-compile the generated ModelNew.  Returns
    (returncode, stdout, stderr) matching the reference compile contract
    (eval.py:18-45)."""
    try:
        _enable_build_cache(build_dir, kernel_src)
        device = _device(device_str)

        ref_ns = _load_module(ref_src, "reference_problem")
        get_inputs = _require(ref_ns, "get_inputs", "reference")
        set_seed(0)
        inputs = get_inputs()

        new_ns = _load_module(kernel_src, "generated_kernel")
        model_new = _build_model(new_ns, "ModelNew", fallback_ns=ref_ns)
        import jax

        inputs = jax.device_put(inputs, device)
        _jitted_call(model_new, inputs, device)
        return 0, f"compiled ModelNew for {device.device_kind}", ""
    except Exception:
        return 1, "", traceback.format_exc(limit=16)


# ----------------------------------------------------------------------
def evaluate_kernel(
    ref_src: str,
    kernel_src: str,
    num_correct_trials: int = 5,
    num_perf_trials: int = 100,
    measure_performance: bool = True,
    build_dir: str = "",
    device_str: str = "",
    seed: int = 42,
    tolerance: float = _DEFAULT_TOL,
) -> KernelExecResult:
    """Value-parity check + timing, with reference-contract error
    classification in metadata (eval.py:78-115)."""
    import jax

    device = _device(device_str)
    hw_meta = {"hardware": device.device_kind, "device": str(device)}

    # --- build both models ---
    try:
        _enable_build_cache(build_dir, kernel_src)
        set_seed(seed)
        ref_ns = _load_module(ref_src, "reference_problem")
        model_ref = _build_model(ref_ns, "Model")
        get_inputs = _require(ref_ns, "get_inputs", "reference")

        set_seed(seed)
        new_ns = _load_module(kernel_src, "generated_kernel")
        model_new = _build_model(new_ns, "ModelNew", fallback_ns=ref_ns)
    except Exception as e:
        return KernelExecResult(
            compiled=False,
            correctness=False,
            metadata={
                "compiler_error": f"failed to build ModelNew: {e}",
                **hw_meta,
            },
        )

    # --- jit-compile both ---
    try:
        set_seed(seed)
        probe_inputs = jax.device_put(get_inputs(), device)
        ref_fn, _ = _jitted_call(model_ref, probe_inputs, device)
        new_fn, _ = _jitted_call(model_new, probe_inputs, device)
    except Exception as e:
        return KernelExecResult(
            compiled=False,
            correctness=False,
            metadata={"compiler_error": f"jit compilation failed: {e}", **hw_meta},
        )

    # --- randomized correctness trials ---
    try:
        for trial in range(num_correct_trials):
            set_seed(seed + trial)
            inputs = jax.device_put(get_inputs(), device)
            expected = jax.tree.map(np.asarray, ref_fn(*inputs))
            got = jax.tree.map(np.asarray, new_fn(*inputs))

            exp_leaves = jax.tree.leaves(expected)
            got_leaves = jax.tree.leaves(got)
            if len(exp_leaves) != len(got_leaves):
                return KernelExecResult(
                    compiled=True,
                    correctness=False,
                    metadata={
                        "correctness_issue": (
                            f"Output structure mismatch: expected "
                            f"{len(exp_leaves)} arrays, got {len(got_leaves)}"
                        ),
                        **hw_meta,
                    },
                )
            for e_arr, g_arr in zip(exp_leaves, got_leaves):
                if np.shape(e_arr) != np.shape(g_arr):
                    return KernelExecResult(
                        compiled=True,
                        correctness=False,
                        metadata={
                            "correctness_issue": (
                                f"Output shape mismatch: expected "
                                f"{np.shape(e_arr)}, got {np.shape(g_arr)}"
                            ),
                            **hw_meta,
                        },
                    )
                if not np.allclose(
                    e_arr, g_arr, atol=tolerance, rtol=tolerance, equal_nan=True
                ):
                    max_diff = float(
                        np.max(np.abs(np.asarray(e_arr, np.float64) - g_arr))
                    )
                    return KernelExecResult(
                        compiled=True,
                        correctness=False,
                        metadata={
                            "correctness_issue": (
                                f"Output value mismatch on trial {trial}: "
                                f"max abs diff {max_diff:.6g} exceeds "
                                f"tolerance {tolerance} "
                                f"(atol={tolerance}, rtol={tolerance})"
                            ),
                            **hw_meta,
                        },
                    )
    except Exception as e:
        return KernelExecResult(
            compiled=True,
            correctness=False,
            metadata={"runtime_error": f"{type(e).__name__}: {e}", **hw_meta},
        )

    if not measure_performance:
        return KernelExecResult(compiled=True, correctness=True, metadata=hw_meta)

    # --- timed trials ---
    try:
        set_seed(seed)
        inputs = jax.device_put(get_inputs(), device)
        jax.block_until_ready(new_fn(*inputs))  # warmup
        times_ms: List[float] = []
        for _ in range(num_perf_trials):
            t0 = time.perf_counter()
            jax.block_until_ready(new_fn(*inputs))
            times_ms.append((time.perf_counter() - t0) * 1e3)
        arr = np.asarray(times_ms)
        stats = {
            "mean": float(arr.mean()),
            "std": float(arr.std()),
            "min": float(arr.min()),
            "max": float(arr.max()),
            "p50": float(np.percentile(arr, 50)),
            "num_trials": int(num_perf_trials),
            **hw_meta,
        }
        return KernelExecResult(
            compiled=True,
            correctness=True,
            metadata=hw_meta,
            runtime=stats["mean"],
            runtime_stats=stats,
        )
    except Exception as e:
        return KernelExecResult(
            compiled=True,
            correctness=True,
            metadata={"runtime_error": f"timing failed: {e}", **hw_meta},
        )


# ----------------------------------------------------------------------
def profile_kernel(
    ref_src: str,
    kernel_src: str,
    build_dir: str = "",
    device_str: str = "",
    num_trials: int = 100,
    table_op_limit: int = 10,
    seed: int = 42,
) -> str:
    """Produce the profiler-feedback table for a correct kernel."""
    import jax

    from caesar_tpu.evalkit.devinfo import peaks_for_device

    device = _device(device_str)
    _enable_build_cache(build_dir, kernel_src)

    set_seed(seed)
    ref_ns = _load_module(ref_src, "reference_problem")
    get_inputs = _require(ref_ns, "get_inputs", "reference")
    set_seed(seed)
    new_ns = _load_module(kernel_src, "generated_kernel")
    model_new = _build_model(new_ns, "ModelNew", fallback_ns=ref_ns)

    inputs = jax.device_put(get_inputs(), device)
    compiled, lowered = _jitted_call(model_new, inputs, device)

    # timing distribution
    jax.block_until_ready(compiled(*inputs))
    times = []
    for _ in range(num_trials):
        t0 = time.perf_counter()
        jax.block_until_ready(compiled(*inputs))
        times.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(times)
    mean_s = arr.mean() / 1e3

    # XLA cost analysis
    flops = bytes_accessed = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = cost.get("flops")
        bytes_accessed = cost.get("bytes accessed")
    except Exception:
        pass

    # HLO op histogram from the optimized module
    histogram: Dict[str, int] = {}
    try:
        hlo = compiled.as_text()
        for line in hlo.splitlines():
            line = line.strip()
            if "=" not in line or line.startswith(("HloModule", "ENTRY", "//")):
                continue
            rhs = line.split("=", 1)[1].strip()
            parts = rhs.split(" ")
            op = parts[1].split("(")[0] if len(parts) > 1 else ""
            op = op.strip()
            if op and op[0].isalpha():
                histogram[op] = histogram.get(op, 0) + 1
    except Exception:
        pass

    peaks = peaks_for_device(device)
    lines = [
        f"Profiler report for ModelNew (jit-compiled on {device.device_kind})",
        f"  trials: {num_trials}",
        f"  wall time per call: mean {arr.mean():.4f} ms, p50 "
        f"{np.percentile(arr, 50):.4f} ms, min {arr.min():.4f} ms, "
        f"max {arr.max():.4f} ms",
    ]
    if flops:
        gflops = flops / 1e9
        achieved = flops / mean_s
        lines.append(
            f"  compute: {gflops:.3f} GFLOP per call -> "
            f"{achieved / 1e12:.3f} TFLOP/s achieved "
            f"({100.0 * achieved / peaks.flops_bf16:.1f}% of {peaks.name} "
            f"bf16 peak, {100.0 * achieved / peaks.flops_f32:.1f}% of f32 peak)"
        )
    if bytes_accessed:
        gbs = bytes_accessed / mean_s / 1e9
        lines.append(
            f"  memory: {bytes_accessed / 1e6:.3f} MB accessed per call -> "
            f"{gbs:.1f} GB/s achieved "
            f"({100.0 * gbs * 1e9 / peaks.hbm_bw:.1f}% of {peaks.name} HBM peak)"
        )
    if flops and bytes_accessed and bytes_accessed > 0:
        intensity = flops / bytes_accessed
        ridge = peaks.flops_bf16 / peaks.hbm_bw
        bound = "compute-bound" if intensity >= ridge else "memory-bandwidth-bound"
        lines.append(
            f"  arithmetic intensity: {intensity:.2f} FLOP/byte "
            f"(ridge point {ridge:.1f}) -> {bound}"
        )
    if histogram:
        top = sorted(histogram.items(), key=lambda kv: -kv[1])[:table_op_limit]
        lines.append(f"  HLO ops (top {table_op_limit} by count):")
        for op, count in top:
            lines.append(f"    {op:<24} x{count}")
    return "\n".join(lines) + "\n"
