"""Integration: mock generator + REAL JAX eval sandbox, end to end.

The mock generator emits a ModelNew subclassing the problem's Model, so the
full trajectory (prompt -> generate -> jit compile -> value parity -> timing
-> profiler table -> journal) runs against the real JAX backend with zero
model weights.
"""

import asyncio
import json

from caesar_tpu.config import default_test_config
from caesar_tpu.evalkit.dataset import resolve_dataset
from caesar_tpu.evalkit.sandbox import EvalSandbox
from caesar_tpu.harness.driver import run_single_work
from caesar_tpu.harness.generate import MockGenerator
from caesar_tpu.harness.resources import SliceResourceManager
from caesar_tpu.harness.work import WorkItem


def test_mock_generation_real_jax_eval(tmp_path):
    cfg = default_test_config(
        log_dir_prefix=str(tmp_path / "logs"),
        build_dir_prefix=str(tmp_path / "build"),
        max_k=1,
        eval_backend="jax",
        num_correct_trials=2,
        num_perf_trials=3,
        timeout=300.0,
        profiler_timeout=300.0,
    )
    ds = resolve_dataset("kernelbench-tpu/level1-test")
    work = WorkItem(23, 1, ds.get_problem_path_by_id(23))

    async def go():
        return await run_single_work(
            cfg,
            work,
            MockGenerator(),
            EvalSandbox(
                backend="jax",
                timeout=cfg.timeout,
                profiler_timeout=cfg.profiler_timeout,
            ),
            SliceResourceManager(1),
        )

    stm = asyncio.run(go())
    assert stm.journal.is_done()
    log = json.loads(stm.journal.log_file.read_text())
    ev = log["1"]["eval_result"]
    assert ev["compiled"] is True, ev
    assert ev["correctness"] is True, ev
    assert ev["runtime"] > 0
    assert "Profiler report" in log["1"]["profiler_result"]
    assert "HLO ops" in log["1"]["profiler_result"]
