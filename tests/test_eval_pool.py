"""Pooled eval sandbox: warm runner subprocesses (sandbox._PoolWorker).

The one-shot sandbox pays a full Python+JAX import per op (~2.5 s measured
on this host, dominating small-problem evals); pool mode keeps
eval_workers warm ``runner --serve`` children.  These tests pin the safety
contract the pool must preserve: exact-child timeout kill, crash respawn,
and framing immunity to whatever the evaluated kernel writes to fd 1.
"""

import os

import pytest

from caesar_tpu.evalkit.sandbox import EvalSandbox

_PROBLEM = os.path.join(
    os.path.dirname(__file__), "..", "problems", "level1",
)


def _ref_src():
    files = sorted(os.listdir(_PROBLEM))
    with open(os.path.join(_PROBLEM, files[0])) as f:
        return f.read()


@pytest.fixture(scope="module")
def pool_sandbox():
    sb = EvalSandbox(backend="jax", timeout=60, pool_size=1)
    yield sb
    sb.close()


@pytest.mark.slow
def test_pool_reuses_worker_and_survives_noise(pool_sandbox):
    src = _ref_src()
    cand = src + "\nModelNew = Model\n"
    r1 = pool_sandbox.evaluate(src, cand, num_correct_trials=2,
                               num_perf_trials=3)
    assert r1.compiled and r1.correctness
    # evaluated code printing / raw-writing to fd 1 must not corrupt the
    # line framing of the NEXT response
    noisy = cand + "\nimport os\nprint('NOISE')\nos.write(1, b'RAW')\n"
    r2 = pool_sandbox.evaluate(src, noisy, num_correct_trials=2,
                               num_perf_trials=3)
    assert r2.compiled and r2.correctness
    # same worker served both (no respawn)
    assert pool_sandbox._spawned == 1


@pytest.mark.slow
def test_pool_respawns_after_worker_crash(pool_sandbox):
    src = _ref_src()
    crasher = src + "\nimport os\nos._exit(9)\nModelNew = Model\n"
    r = pool_sandbox.evaluate(src, crasher, num_correct_trials=1,
                              num_perf_trials=1)
    assert not r.compiled  # surfaced as an error result, not an exception
    # the pool must still serve afterwards
    cand = src + "\nModelNew = Model\n"
    r2 = pool_sandbox.evaluate(src, cand, num_correct_trials=1,
                               num_perf_trials=1)
    assert r2.compiled and r2.correctness


@pytest.mark.slow
def test_pool_timeout_kills_exact_worker():
    src = _ref_src()
    sb = EvalSandbox(backend="jax", timeout=5, pool_size=1)
    try:
        hang = src + "\nwhile True: pass\nModelNew = Model\n"
        r = sb.evaluate(src, hang, num_correct_trials=1, num_perf_trials=1)
        assert "timeout_error" in r.metadata
        # fresh worker serves the next request
        cand = src + "\nModelNew = Model\n"
        r2 = sb.evaluate(src, cand, num_correct_trials=1, num_perf_trials=1)
        assert r2.compiled and r2.correctness
    finally:
        sb.close()
