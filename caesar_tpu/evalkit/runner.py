"""Subprocess entry point for isolated kernel evaluation.

Reads one JSON request on stdin, performs the op, writes one JSON response on
stdout.  Run as ``python -m caesar_tpu.evalkit.runner``.  The parent
(subproc.py) controls the environment — notably JAX_PLATFORMS=cpu so host-side
evals never contend with the serving engine for the TPU — and enforces the
timeout by killing this process, which is exactly the isolation the reference
got from one mp.Process per eval (state_machine.py:327-342): the device
context dies with the child.

Request:  {"op": "compile"|"evaluate"|"profile", "backend": "mock"|"jax"|
           "torch_cpu", "kwargs": {...}}
Response: {"ok": true, "result": ...} | {"ok": false, "error": "<traceback>"}
"""

from __future__ import annotations

import json
import sys
import traceback

from caesar_tpu.evalkit.result import KernelExecResult


def _backend(name: str):
    if name == "mock":
        from caesar_tpu.evalkit import mock_eval as backend
    elif name == "jax":
        from caesar_tpu.evalkit import jax_eval as backend
    elif name == "torch_cpu":
        from caesar_tpu.evalkit import torch_eval as backend
    else:
        raise KeyError(f"unknown eval backend {name!r}")
    return backend


def handle_request(request: dict) -> dict:
    backend = _backend(request["backend"])
    op = request["op"]
    kwargs = request.get("kwargs", {})
    if op == "compile":
        rc, out, err = backend.compile_kernel(**kwargs)
        return {"ok": True, "result": [rc, out, err]}
    if op == "evaluate":
        result = backend.evaluate_kernel(**kwargs)
        if isinstance(result, KernelExecResult):
            result = result.to_dict()
        return {"ok": True, "result": result}
    if op == "profile":
        return {"ok": True, "result": backend.profile_kernel(**kwargs)}
    raise KeyError(f"unknown op {op!r}")


def serve() -> int:
    """Persistent worker loop (sandbox pool mode): one JSON request per
    stdin line, one JSON response per stdout line, until EOF.

    Amortizes the Python+JAX import (~2.5 s on this 2-core host — measured
    to dominate a one-shot eval) across many evals; the parent still owns
    the timeout by killing this exact process and respawning.

    Framing defense: evaluated kernel code can print() or even
    os.write(1, ...) — the protocol stream is dup'd to a private fd and
    fd 1 is re-pointed at stderr BEFORE any request runs, so nothing the
    sandboxed code writes can corrupt a response line."""
    import os

    proto = os.fdopen(os.dup(1), "w")
    os.dup2(2, 1)  # fd-level: raw writes to fd 1 land on stderr
    for line in sys.stdin:
        if not line.strip():
            continue
        try:
            response = handle_request(json.loads(line))
        except Exception:
            response = {"ok": False, "error": traceback.format_exc(limit=24)}
        proto.write(json.dumps(response) + "\n")
        proto.flush()
    return 0


def main() -> int:
    if "--serve" in sys.argv[1:]:
        return serve()
    try:
        request = json.load(sys.stdin)
        response = handle_request(request)
    except Exception:
        response = {"ok": False, "error": traceback.format_exc(limit=24)}
    json.dump(response, sys.stdout)
    sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
