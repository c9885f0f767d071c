import asyncio
import json

from caesar_tpu.analysis.compare import compare_runs
from caesar_tpu.analysis.sweep import sweep_group
from caesar_tpu.config import default_test_config
from caesar_tpu.harness.driver import run_all
from caesar_tpu.harness.generate import MockGenerator


def make_run(tmp_path, name, script=None):
    cfg = default_test_config(
        log_dir_prefix=str(tmp_path / "logs"),
        build_dir_prefix=str(tmp_path / "build"),
        max_k=2,
        dataset_name="kernelbench-tpu/level1-subset",
    )
    cfg.run_name = name
    gen = MockGenerator(script=script)
    asyncio.run(run_all(cfg, generator=gen, progress_interval=0))
    return tmp_path / "logs" / "test_group" / name


def test_sweep_curves(tmp_path):
    make_run(tmp_path, "good")
    make_run(tmp_path, "flaky", script=["fail_correctness", "ok"])
    out = sweep_group(tmp_path / "logs" / "test_group", max_k=2)
    assert out["runs"]["good"][1]["fast0"] == 1.0
    assert out["runs"]["flaky"][1]["fast0"] == 0.0
    assert out["runs"]["flaky"][2]["fast0"] == 1.0  # recovers at turn 2


def test_compare_runs(tmp_path):
    a = make_run(tmp_path, "a")
    b = make_run(tmp_path, "b", script=["fail_correctness", "fail_correctness"])
    out = compare_runs(a, b, k=2)
    assert out["fast0_a"] == 1.0
    assert out["fast0_b"] == 0.0
    assert out["fast0_delta"] == -1.0
    flips = [d for d in out["notable_diffs"] if d["kind"] == "correctness_flip"]
    assert len(flips) == 10
