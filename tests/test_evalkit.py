"""Eval sandbox tests: mock backend, JAX backend, process isolation."""

import textwrap

import pytest

from caesar_tpu.evalkit import mock_eval
from caesar_tpu.evalkit.result import KernelExecResult
from caesar_tpu.evalkit.sandbox import EvalSandbox

SMALL_REF = textwrap.dedent(
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    class Model:
        def __init__(self):
            pass

        def __call__(self, x):
            return jax.nn.softmax(x, axis=-1)

    def get_inputs():
        return [jnp.asarray(np.random.randn(32, 64).astype(np.float32))]

    def get_init_inputs():
        return []
    """
)

GOOD_KERNEL = textwrap.dedent(
    """
    import jax
    import jax.numpy as jnp

    class ModelNew:
        def __init__(self):
            pass

        def __call__(self, x):
            m = jnp.max(x, axis=-1, keepdims=True)
            e = jnp.exp(x - m)
            return e / jnp.sum(e, axis=-1, keepdims=True)
    """
)

WRONG_KERNEL = textwrap.dedent(
    """
    import jax.numpy as jnp

    class ModelNew:
        def __init__(self):
            pass

        def __call__(self, x):
            return x * 2.0
    """
)

BROKEN_KERNEL = "def broken(:\n"

NO_MODELNEW_KERNEL = "x = 1\n"


# ----------------------------------------------------------------------
# mock backend
# ----------------------------------------------------------------------

def test_mock_compile_ok():
    rc, out, err = mock_eval.compile_kernel("class ModelNew:\n    pass\n")
    assert rc == 0


def test_mock_compile_syntax_error():
    rc, _, err = mock_eval.compile_kernel(BROKEN_KERNEL)
    assert rc == 1
    assert "SyntaxError" in err


def test_mock_compile_requires_modelnew():
    rc, _, err = mock_eval.compile_kernel(NO_MODELNEW_KERNEL)
    assert rc == 1
    assert "ModelNew" in err


def test_mock_evaluate_deterministic():
    src = "class ModelNew:\n    pass\n"
    r1 = mock_eval.evaluate_kernel("", src)
    r2 = mock_eval.evaluate_kernel("", src)
    assert r1.correctness and r2.correctness
    assert r1.runtime == r2.runtime > 0


def test_mock_forced_failures():
    src = f"class ModelNew:\n    pass\n# {mock_eval.FAIL_CORRECTNESS_MARKER}\n"
    r = mock_eval.evaluate_kernel("", src)
    assert r.compiled and not r.correctness
    assert "correctness_issue" in r.metadata


def test_mock_sandbox_end_to_end():
    sb = EvalSandbox(backend="mock")
    rc, _, _ = sb.compile("class ModelNew:\n    pass\n", SMALL_REF)
    assert rc == 0
    res = sb.evaluate(SMALL_REF, "class ModelNew:\n    pass\n")
    assert isinstance(res, KernelExecResult)
    assert res.correctness
    table = sb.profile(SMALL_REF, "class ModelNew:\n    pass\n")
    assert "Profiler report" in table


# ----------------------------------------------------------------------
# JAX backend (inline, no subprocess — fast path for unit tests)
# ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def jax_sandbox():
    return EvalSandbox(backend="jax", isolate=False, timeout=120)


def test_jax_compile_good_kernel(jax_sandbox):
    rc, out, err = jax_sandbox.compile(GOOD_KERNEL, SMALL_REF)
    assert rc == 0, err


def test_jax_compile_broken_kernel(jax_sandbox):
    rc, _, err = jax_sandbox.compile(BROKEN_KERNEL, SMALL_REF)
    assert rc == 1
    assert "SyntaxError" in err


def test_jax_evaluate_correct_kernel(jax_sandbox):
    res = jax_sandbox.evaluate(
        SMALL_REF, GOOD_KERNEL, num_correct_trials=3, num_perf_trials=5
    )
    assert res.compiled, res.metadata
    assert res.correctness, res.metadata
    assert res.runtime > 0
    assert res.runtime_stats["num_trials"] == 5


def test_jax_evaluate_wrong_kernel(jax_sandbox):
    res = jax_sandbox.evaluate(
        SMALL_REF, WRONG_KERNEL, num_correct_trials=3, num_perf_trials=5
    )
    assert res.compiled
    assert not res.correctness
    assert "correctness_issue" in res.metadata
    assert res.runtime == -1.0


def test_jax_evaluate_unbuildable_kernel(jax_sandbox):
    res = jax_sandbox.evaluate(SMALL_REF, NO_MODELNEW_KERNEL)
    assert not res.compiled
    assert "compiler_error" in res.metadata


def test_jax_profile_table(jax_sandbox):
    table = jax_sandbox.profile(SMALL_REF, GOOD_KERNEL)
    assert "Profiler report" in table
    assert "wall time" in table
    assert "HLO ops" in table


# ----------------------------------------------------------------------
# subprocess isolation
# ----------------------------------------------------------------------

def test_subprocess_isolated_eval():
    sb = EvalSandbox(backend="jax", isolate=True, timeout=300)
    res = sb.evaluate(
        SMALL_REF, GOOD_KERNEL, num_correct_trials=2, num_perf_trials=3
    )
    assert res.correctness, res.metadata


def test_subprocess_timeout_classified():
    sb = EvalSandbox(backend="jax", isolate=True, timeout=3)
    hang = "import time\ntime.sleep(60)\nclass ModelNew:\n    pass\n"
    res = sb.evaluate(SMALL_REF, hang)
    assert not res.compiled
    assert "timeout_error" in res.metadata


def test_subprocess_crash_classified():
    sb = EvalSandbox(backend="jax", isolate=True, timeout=60)
    crasher = "import os\nos._exit(17)\nclass ModelNew:\n    pass\n"
    res = sb.evaluate(SMALL_REF, crasher)
    assert not res.compiled
    assert "other_error" in res.metadata
