"""Host-side eval sandbox: the state machine's compile/evaluate/profile API.

Wraps the eval backends with process isolation + timeouts, replacing the
reference's trio of SIGALRM Timeout, mp.Process-per-eval, and
join(timeout)+terminate (eval.py:18-45, state_machine.py:327-361).  Here a
fresh subprocess runs each op with the timeout enforced by killing the exact
child we spawned; a timeout or crash can never wedge the host or leak device
state.  The profiler op is timeout-bounded too — the reference waited forever
on the profiler child (state_machine.py:422; SURVEY.md §7.4).

Timeout/crash results are classified into KernelExecResult.metadata with the
reference's vocabulary (timeout_error / other_error, eval.py:78-115) so the
feedback path is identical.
"""

from __future__ import annotations

import json
import os
import queue
import select
import subprocess
import sys
import threading
import time
from typing import Optional, Tuple

from caesar_tpu.evalkit.result import KernelExecResult

_TIMEOUT_SENTINEL = "__timeout__"

#: pool workers are recycled after this many requests: each generated
#: kernel is new source, so the worker's jax compile cache only grows
_WORKER_RECYCLE = 32


class _PoolWorker:
    """One persistent runner subprocess (``runner --serve``): line-framed
    JSON requests in, responses out.  Timeout/crash handling keeps the
    one-shot sandbox's guarantee — the exact child is killed, never a
    pattern — the parent just respawns a fresh worker afterwards."""

    def __init__(self, env_overrides: dict):
        env = dict(os.environ)
        for key, value in env_overrides.items():
            if value is None:
                env.pop(key, None)
            else:
                env[key] = value
        self.proc = subprocess.Popen(
            [sys.executable, "-m", "caesar_tpu.evalkit.runner", "--serve"],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            env=env,
        )
        self.buf = b""
        self.served = 0

    def request(self, request: dict, timeout: float) -> Optional[dict]:
        """None = worker died mid-request (caller respawns + retries once);
        the timeout sentinel response mirrors the one-shot path."""
        try:
            self.proc.stdin.write(json.dumps(request).encode() + b"\n")
            self.proc.stdin.flush()
        except (BrokenPipeError, OSError):
            return None
        deadline = time.monotonic() + timeout
        fd = self.proc.stdout.fileno()
        while b"\n" not in self.buf:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                return {"ok": False, "error": _TIMEOUT_SENTINEL}
            ready, _, _ = select.select([fd], [], [], min(remaining, 1.0))
            if ready:
                chunk = os.read(fd, 1 << 16)
                if not chunk:  # EOF: the evaluated code crashed the worker
                    return None
                self.buf += chunk
        line, _, self.buf = self.buf.partition(b"\n")
        self.served += 1
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            return None

    def kill(self) -> None:
        try:
            self.proc.kill()
            self.proc.wait(timeout=5)
        except Exception:
            pass


def _run_runner(request: dict, timeout: float, env_overrides: dict) -> dict:
    """Spawn the runner subprocess for one request; kill the exact child on
    timeout (never a pattern kill)."""
    env = dict(os.environ)
    for key, value in env_overrides.items():
        if value is None:
            env.pop(key, None)
        else:
            env[key] = value
    proc = subprocess.Popen(
        [sys.executable, "-m", "caesar_tpu.evalkit.runner"],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env=env,
        text=True,
    )
    try:
        out, err = proc.communicate(json.dumps(request), timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
        return {"ok": False, "error": _TIMEOUT_SENTINEL}
    if proc.returncode != 0:
        return {
            "ok": False,
            "error": f"eval subprocess exited {proc.returncode}: {err[-4000:]}",
        }
    try:
        return json.loads(out)
    except json.JSONDecodeError:
        return {
            "ok": False,
            "error": f"eval subprocess produced unparseable output: {out[-2000:]}",
        }


class EvalSandbox:
    """compile / evaluate / profile over an isolated backend."""

    def __init__(
        self,
        backend: str = "mock",
        timeout: float = 600.0,
        profiler_timeout: float = 600.0,
        isolate: Optional[bool] = None,
        eval_platform: str = "cpu",
        pool_size: int = 0,
    ):
        """
        Args:
            backend: mock | jax | torch_cpu
            timeout: seconds per compile/evaluate round
                (reference caesar_config.py:52 default 600)
            profiler_timeout: seconds per profile round
            isolate: run ops in a fresh subprocess; defaults to True for real
                backends, False for mock (pure in-process logic)
            eval_platform: JAX_PLATFORMS value for isolated jax evals — "cpu"
                keeps generated-kernel execution off the serving engine's TPU
            pool_size: >0 keeps up to this many WARM runner subprocesses
                (``runner --serve``) instead of spawning one per op — the
                per-op Python+JAX import (~2.5 s measured on this host)
                otherwise dominates every eval.  Timeout semantics are
                identical: the exact worker is killed and replaced.
        """
        self.backend = backend
        self.timeout = timeout
        self.profiler_timeout = profiler_timeout
        self.isolate = isolate if isolate is not None else backend != "mock"
        self.eval_platform = eval_platform
        self.pool_size = pool_size if self.isolate else 0
        self._pool: Optional[queue.Queue] = (
            queue.Queue() if self.pool_size else None
        )
        self._spawned = 0
        self._spawn_lock = threading.Lock()

    # ------------------------------------------------------------------
    def _borrow(self) -> "_PoolWorker":
        try:
            return self._pool.get_nowait()
        except queue.Empty:
            pass
        with self._spawn_lock:
            if self._spawned < self.pool_size:
                self._spawned += 1
                return _PoolWorker(self._env_overrides())
        return self._pool.get()  # bounded upstream by the eval-slot sem

    def _discard(self, worker: "_PoolWorker") -> None:
        worker.kill()
        with self._spawn_lock:
            self._spawned -= 1

    def _return(self, worker: "_PoolWorker") -> None:
        if worker.served >= _WORKER_RECYCLE:
            self._discard(worker)  # jax compile cache only grows
        else:
            self._pool.put(worker)

    def _dispatch_pooled(self, request: dict, timeout: float) -> dict:
        worker = self._borrow()
        response = worker.request(request, timeout)
        if response is None:  # worker died mid-request: respawn, retry once
            self._discard(worker)
            worker = self._borrow()
            response = worker.request(request, timeout)
        if response is None:
            self._discard(worker)
            return {"ok": False, "error": "eval worker died twice on request"}
        if response.get("error") == _TIMEOUT_SENTINEL:
            self._discard(worker)  # the op is still running inside — kill
        else:
            self._return(worker)
        return response

    def close(self) -> None:
        """Kill pooled workers (no-op for one-shot mode)."""
        if self._pool is None:
            return
        while True:
            try:
                self._pool.get_nowait().kill()
            except queue.Empty:
                break

    # ------------------------------------------------------------------
    def _env_overrides(self) -> dict:
        env = {}
        if self.backend == "jax" and self.eval_platform == "cpu":
            # Two belts: JAX_PLATFORMS for stock JAX, and stripping
            # PALLAS_AXON_POOL_IPS so an axon-tunnel TPU plugin (which
            # force-overrides jax_platforms at interpreter start) never
            # registers in the child.  Without this, eval children block on
            # the exclusive TPU device lock held by the serving engine.
            env["JAX_PLATFORMS"] = "cpu"
            env["PALLAS_AXON_POOL_IPS"] = None
        return env

    def _dispatch(self, op: str, kwargs: dict, timeout: float) -> dict:
        request = {"op": op, "backend": self.backend, "kwargs": kwargs}
        if not self.isolate:
            from caesar_tpu.evalkit import runner

            try:
                return runner.handle_request(request)
            except Exception as e:
                return {"ok": False, "error": f"{type(e).__name__}: {e}"}
        if self._pool is not None:
            return self._dispatch_pooled(request, timeout)
        return _run_runner(request, timeout, self._env_overrides())

    # ------------------------------------------------------------------
    def compile(
        self, kernel_src: str, ref_src: str, build_dir: str = ""
    ) -> Tuple[int, str, str]:
        """Returns (returncode, stdout, stderr) — reference eval.py:18-45
        contract, including the timeout-as-returncode -1 shape."""
        response = self._dispatch(
            "compile",
            {"kernel_src": kernel_src, "ref_src": ref_src, "build_dir": build_dir},
            self.timeout,
        )
        if response.get("ok"):
            rc, out, err = response["result"]
            return int(rc), out, err
        if response.get("error") == _TIMEOUT_SENTINEL:
            msg = f"Compilation timed out after {self.timeout} seconds"
            return -1, msg, msg
        return -1, "", str(response.get("error"))

    def evaluate(
        self,
        ref_src: str,
        kernel_src: str,
        num_correct_trials: int = 5,
        num_perf_trials: int = 100,
        measure_performance: bool = True,
        build_dir: str = "",
    ) -> KernelExecResult:
        response = self._dispatch(
            "evaluate",
            {
                "ref_src": ref_src,
                "kernel_src": kernel_src,
                "num_correct_trials": num_correct_trials,
                "num_perf_trials": num_perf_trials,
                "measure_performance": measure_performance,
                "build_dir": build_dir,
            },
            self.timeout,
        )
        if response.get("ok"):
            return KernelExecResult.from_dict(response["result"])
        if response.get("error") == _TIMEOUT_SENTINEL:
            return KernelExecResult(
                compiled=False,
                correctness=False,
                metadata={
                    "timeout_error": (
                        f"Evaluation timed out after {self.timeout} seconds"
                    ),
                    "hardware": self.backend,
                    "device": self.eval_platform,
                },
            )
        return KernelExecResult(
            compiled=False,
            correctness=False,
            metadata={
                "other_error": f"error: {response.get('error')}",
                "hardware": self.backend,
                "device": self.eval_platform,
            },
        )

    def profile(self, ref_src: str, kernel_src: str, build_dir: str = "") -> str:
        response = self._dispatch(
            "profile",
            {"ref_src": ref_src, "kernel_src": kernel_src, "build_dir": build_dir},
            self.profiler_timeout,
        )
        if response.get("ok"):
            return response["result"]
        if response.get("error") == _TIMEOUT_SENTINEL:
            return f"profiler timed out after {self.profiler_timeout} seconds"
        return f"profiler failed: {response.get('error')}"
