import asyncio
import json

from caesar_tpu.analysis.fastp import (
    best_runtime_up_to_k,
    compute_fast_0_for_run,
    compute_fast_p_for_run,
    fastp,
    fetch_baseline_ms,
)
from caesar_tpu.config import default_test_config
from caesar_tpu.harness import runs
from caesar_tpu.harness.driver import run_all


def test_fastp_scoring():
    is_correct = [True, True, False, True]
    baseline = [10.0, 10.0, 10.0, 10.0]
    actual = [5.0, 20.0, 1.0, 9.0]
    # speedups: 2.0, 0.5, (incorrect), 1.11
    assert fastp(is_correct, baseline, actual, 4, 1.0) == 0.5
    assert fastp(is_correct, baseline, actual, 4, 0.0) == 0.75
    assert fastp(is_correct, baseline, actual, 4, 1.5) == 0.25
    assert fastp([], [], [], 0, 1.0) == 0.0


def test_best_runtime_up_to_k():
    log = {
        "1": {"eval_result": {"compiled": True, "correctness": True, "runtime": 5.0}},
        "2": {"eval_result": {"compiled": True, "correctness": False, "runtime": 1.0}},
        "3": {"eval_result": {"compiled": True, "correctness": True, "runtime": 3.0}},
    }
    assert best_runtime_up_to_k(log, 1) == 5.0
    assert best_runtime_up_to_k(log, 2) == 5.0
    assert best_runtime_up_to_k(log, 3) == 3.0
    assert best_runtime_up_to_k({"1": {"eval_result": {}}}, 3) is None


def test_baseline_lookup(tmp_path):
    table = {"level1": {"23_Softmax": {"mean": 4.2}, "1_MatMul": {"mean": 7.0}}}
    f = tmp_path / "baseline.json"
    f.write_text(json.dumps(table))
    assert fetch_baseline_ms(f, 1, 23) == 4.2
    assert fetch_baseline_ms(f, 1, 1) == 7.0
    assert fetch_baseline_ms(f, 1, 99) is None


def _run_mock_sweep(tmp_path):
    cfg = default_test_config(
        log_dir_prefix=str(tmp_path / "logs"),
        build_dir_prefix=str(tmp_path / "build"),
        max_k=2,
        dataset_name="kernelbench-tpu/level1-subset",
        num_workers=8,
    )
    asyncio.run(run_all(cfg, progress_interval=0))
    return tmp_path / "logs" / "test_group" / "test_run"


def test_fast0_over_mock_run(tmp_path):
    run_path = _run_mock_sweep(tmp_path)
    assert compute_fast_0_for_run(run_path, k=2) == 1.0


def test_fastp_over_mock_run_with_baseline(tmp_path):
    run_path = _run_mock_sweep(tmp_path)
    # a generous baseline makes every mock runtime (<2.5ms) a >1x win
    table = {
        "level1": {
            f"{pid}_x": {"mean": 1000.0}
            for pid in runs.get_problem_ids(tmp_path / "logs", "test_group", "test_run")
        }
    }
    f = tmp_path / "baseline.json"
    f.write_text(json.dumps(table))
    assert compute_fast_p_for_run(run_path, f, level=1, k=2, p=1.0) == 1.0


def test_run_census(tmp_path):
    _run_mock_sweep(tmp_path)
    base = tmp_path / "logs"
    assert runs.get_run_groups(base) == ["test_group"]
    assert runs.get_runs(base, "test_group") == ["test_run"]
    pids = runs.get_problem_ids(base, "test_group", "test_run")
    assert len(pids) == 10
    stats = runs.get_finished_counts(base, "test_group")
    assert stats["test_run"] == {"finished": 10, "attempted": 10}
    sd = runs.sample_dir(base, "test_group", "test_run", pids[0], 1)
    log = runs.load_log(sd)
    compiled, correct, runtime = runs.turn_trajectories(log, 2)
    assert compiled == [True, True]
    assert correct == [True, True]
    assert all(r and r > 0 for r in runtime)
    assert runs.prev_problem_id(pids, pids[1]) == pids[0]
    assert runs.next_problem_id(pids, pids[-1]) == pids[-1]
