"""Viewer tests: render real mock-run journals through the HTTP app."""

import asyncio
import json

from caesar_tpu.config import default_test_config
from caesar_tpu.harness.driver import run_all
from caesar_tpu.interface.viewer import ViewerApp, _input_tokens, _output_tokens


def make_run(tmp_path):
    cfg = default_test_config(
        log_dir_prefix=str(tmp_path / "logs"),
        build_dir_prefix=str(tmp_path / "build"),
        max_k=2,
        dataset_name="kernelbench-tpu/level1-test",
    )
    asyncio.run(run_all(cfg, progress_interval=0))
    return tmp_path / "logs"


def test_token_accounting_both_conventions():
    assert _input_tokens({"input_tokens": 5}) == 5
    assert _input_tokens({"prompt_tokens": 7}) == 7
    assert _output_tokens({"output_tokens": 2}) == 2
    assert _output_tokens({"completion_tokens": 3}) == 3
    assert _input_tokens({}) is None


def test_viewer_index_and_drilldown(tmp_path):
    logs = make_run(tmp_path)
    app = ViewerApp(str(logs))

    index = app.render({})
    assert "test_group" in index

    group = app.render({"run_group": "test_group"})
    assert "test_run" in group
    assert "finished" in group

    page = app.render(
        {
            "run_group": "test_group",
            "run_name": "test_run",
            "problem_id": "23",
            "sample_id": "1",
        }
    )
    assert "Turn 1" in page and "Turn 2" in page
    assert "Kernel code" in page
    assert "Profiler output" in page
    assert "<svg" in page  # runtime plot rendered
    assert "UNFINISHED" not in page


def test_viewer_partial_run_banner(tmp_path):
    logs = make_run(tmp_path)
    done = (
        logs / "test_group" / "test_run" / "problem_23" / "sample_1" / "DONE"
    )
    done.unlink()
    app = ViewerApp(str(logs))
    page = app.render(
        {"run_group": "test_group", "run_name": "test_run"}
    )
    assert "UNFINISHED" in page


def test_viewer_baseline_overlay(tmp_path):
    logs = make_run(tmp_path)
    baseline = tmp_path / "baseline.json"
    baseline.write_text(json.dumps({"level1": {"23_Softmax": {"mean": 99.0}}}))
    app = ViewerApp(str(logs), baseline_file=str(baseline))
    page = app.render(
        {"run_group": "test_group", "run_name": "test_run", "problem_id": "23"}
    )
    assert "baseline 99.000 ms" in page


def test_viewer_no_crash_on_missing_final_result(tmp_path):
    """The reference viewer crashed (undefined Warning, viewer.py:457) when a
    trajectory had no final eval result; ours must render."""
    logs = make_run(tmp_path)
    sample = logs / "test_group" / "test_run" / "problem_23" / "sample_1"
    log = json.loads((sample / "log.json").read_text())
    for turn in log.values():
        turn["eval_result"] = {}
    (sample / "log.json").write_text(json.dumps(log))
    app = ViewerApp(str(logs))
    page = app.render(
        {"run_group": "test_group", "run_name": "test_run", "problem_id": "23"}
    )
    assert "no successful runtimes" in page
