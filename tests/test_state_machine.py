"""State-machine behavior and recovery tests (mock generator + mock eval)."""

import asyncio
import json

import pytest

from caesar_tpu.config import default_test_config
from caesar_tpu.evalkit.dataset import resolve_dataset
from caesar_tpu.evalkit.sandbox import EvalSandbox
from caesar_tpu.harness.driver import run_all, run_single_work
from caesar_tpu.harness.generate import MockGenerator
from caesar_tpu.harness.journal import TurnJournal
from caesar_tpu.harness.resources import SliceResourceManager
from caesar_tpu.harness.state_machine import TrajectoryStateMachine
from caesar_tpu.harness.transitions import get_transition
from caesar_tpu.harness.work import WorkItem


def make_cfg(tmp_path, **overrides):
    kwargs = dict(
        log_dir_prefix=str(tmp_path / "logs"),
        build_dir_prefix=str(tmp_path / "build"),
        num_workers=4,
        eval_workers=2,
    )
    kwargs.update(overrides)
    return default_test_config(**kwargs)


def softmax_work():
    ds = resolve_dataset("kernelbench-tpu/level1-test")
    return WorkItem(23, 1, ds.get_problem_path_by_id(23))


def run_one(cfg, work, generator=None):
    async def go():
        return await run_single_work(
            cfg,
            work,
            generator or MockGenerator(),
            EvalSandbox(backend=cfg.eval_backend, timeout=cfg.timeout),
            SliceResourceManager(cfg.eval_workers),
        )

    return asyncio.run(go())


# ----------------------------------------------------------------------

def test_full_trajectory_mock(tmp_path):
    cfg = make_cfg(tmp_path, max_k=3)
    stm = run_one(cfg, softmax_work())
    assert stm.journal.is_done()
    log = json.loads(stm.journal.log_file.read_text())
    assert set(log.keys()) == {"1", "2", "3"}
    for turn in "123":
        rec = log[turn]
        assert rec["prompt"]
        assert rec["model_response"]
        assert rec["kernel_code"]
        assert rec["eval_result"]["correctness"] is True
        assert rec["profiler_result"]
        assert rec["token_usage"]["completion_tokens"] > 0


def test_compile_failure_feeds_next_turn(tmp_path):
    cfg = make_cfg(tmp_path, max_k=2)
    gen = MockGenerator(script=["fail_compile", "ok"])
    stm = run_one(cfg, softmax_work(), gen)
    log = json.loads(stm.journal.log_file.read_text())
    assert log["1"]["eval_result"]["compiled"] is False
    # turn 2's prompt must carry the compiler feedback
    assert "Compilation failed" in log["2"]["prompt"]
    assert log["2"]["eval_result"]["correctness"] is True


def test_correctness_failure_feeds_next_turn(tmp_path):
    cfg = make_cfg(tmp_path, max_k=2)
    gen = MockGenerator(script=["fail_correctness", "ok"])
    stm = run_one(cfg, softmax_work(), gen)
    log = json.loads(stm.journal.log_file.read_text())
    assert log["1"]["eval_result"]["compiled"] is True
    assert log["1"]["eval_result"]["correctness"] is False
    assert "correctness" in log["2"]["prompt"].lower()
    # failed turn has no profiler output (short-circuits to FINISH)
    assert log["1"]["profiler_result"] == ""


def test_generate_failure_skips_eval(tmp_path):
    cfg = make_cfg(tmp_path, max_k=1)
    gen = MockGenerator(script=["fail_generate"])
    stm = run_one(cfg, softmax_work(), gen)
    log = json.loads(stm.journal.log_file.read_text())
    assert log["1"]["kernel_code"] == ""
    assert log["1"]["eval_result"] == {}
    assert stm.journal.is_done()


def test_done_short_circuits(tmp_path):
    cfg = make_cfg(tmp_path, max_k=2)
    work = softmax_work()
    stm1 = run_one(cfg, work)
    assert stm1.journal.is_done()
    log_before = stm1.journal.log_file.read_text()
    # second run must skip entirely (finished flag) and not rewrite the log
    stm2 = run_one(cfg, work)
    assert stm2.finished
    assert stm2.journal.log_file.read_text() == log_before


def test_recovery_resumes_from_truncated_log(tmp_path):
    cfg = make_cfg(tmp_path, max_k=3)
    work = softmax_work()
    stm1 = run_one(cfg, work)
    # simulate a crash: drop DONE and corrupt turn 3 (empty response)
    log = json.loads(stm1.journal.log_file.read_text())
    log["3"]["model_response"] = ""
    stm1.journal.log_file.write_text(json.dumps(log))
    stm1.journal.done_file.unlink()

    stm2 = run_one(cfg, work)
    assert stm2.journal.is_done()
    log2 = json.loads(stm2.journal.log_file.read_text())
    assert set(log2.keys()) == {"1", "2", "3"}
    assert log2["3"]["model_response"] != ""
    # turns 1-2 replayed untouched
    assert log2["1"]["kernel_code"] == log["1"]["kernel_code"]


def test_recovery_all_turns_done_missing_done_file(tmp_path):
    cfg = make_cfg(tmp_path, max_k=2)
    work = softmax_work()
    stm1 = run_one(cfg, work)
    stm1.journal.done_file.unlink()
    stm2 = run_one(cfg, work)
    assert stm2.journal.is_done()
    # no extra turns were run
    log = json.loads(stm2.journal.log_file.read_text())
    assert set(log.keys()) == {"1", "2"}


def test_recovery_mid_turn_partial_entry(tmp_path):
    """A turn with prompt but no kernel (killed mid-GENERATE) is redone."""
    cfg = make_cfg(tmp_path, max_k=2)
    work = softmax_work()
    stm1 = run_one(cfg, work)
    log = json.loads(stm1.journal.log_file.read_text())
    log["2"]["kernel_code"] = ""
    log["2"]["eval_result"] = {}
    stm1.journal.log_file.write_text(json.dumps(log))
    stm1.journal.done_file.unlink()

    stm2 = run_one(cfg, work)
    log2 = json.loads(stm2.journal.log_file.read_text())
    assert log2["2"]["kernel_code"] != ""
    assert stm2.journal.is_done()


def test_config_json_written(tmp_path):
    cfg = make_cfg(tmp_path, max_k=1)
    stm = run_one(cfg, softmax_work())
    cfg_on_disk = json.loads((stm.journal.config_file).read_text())
    assert cfg_on_disk["run_name"] == "test_run"
    assert cfg_on_disk["max_k"] == 1


# ----------------------------------------------------------------------
# driver end-to-end
# ----------------------------------------------------------------------

def test_driver_sweep_mock(tmp_path):
    cfg = make_cfg(
        tmp_path,
        max_k=2,
        num_samples=2,
        dataset_name="kernelbench-tpu/level1-subset",
    )
    stats = asyncio.run(run_all(cfg, progress_interval=0))
    assert stats["trajectories"] == 20
    assert stats["failed"] == []
    # every trajectory left a DONE
    import glob

    dones = glob.glob(str(tmp_path / "logs" / "**" / "DONE"), recursive=True)
    assert len(dones) == 20


def test_driver_resume_after_partial_run(tmp_path):
    """Chaos-style kill/resume: cancel a sweep mid-flight, rerun, converge.

    Replicates the reference's shuffle-kill robustness loop
    (scripts/run_shuffle_kill.sh + recovery, SURVEY.md §4.3) in-process.
    """
    cfg = make_cfg(
        tmp_path,
        max_k=2,
        dataset_name="kernelbench-tpu/level1-subset",
    )

    async def partial():
        gen = MockGenerator(latency_s=0.05)
        task = asyncio.create_task(run_all(cfg, generator=gen, progress_interval=0))
        await asyncio.sleep(0.4)  # let a few trajectories finish
        task.cancel()
        try:
            await task
        except asyncio.CancelledError:
            pass

    asyncio.run(partial())

    stats = asyncio.run(run_all(cfg, progress_interval=0))
    assert stats["failed"] == []
    import glob

    dones = glob.glob(str(tmp_path / "logs" / "**" / "DONE"), recursive=True)
    assert len(dones) == 10


# ----------------------------------------------------------------------
# eval-slot discipline
# ----------------------------------------------------------------------

def test_eval_slots_bound_concurrency(tmp_path):
    max_busy = 0

    class SpyResources(SliceResourceManager):
        def reserve_eval_slot(self):
            outer = super().reserve_eval_slot()
            mgr = self

            class Ctx:
                async def __aenter__(self):
                    nonlocal max_busy
                    slot = await outer.__aenter__()
                    max_busy = max(max_busy, mgr.busy)
                    return slot

                async def __aexit__(self, *a):
                    return await outer.__aexit__(*a)

            return Ctx()

    cfg = make_cfg(
        tmp_path, max_k=1, dataset_name="kernelbench-tpu/level1-subset",
        num_workers=8, eval_workers=2,
    )

    async def go():
        ds = resolve_dataset(cfg.dataset_name)
        res = SpyResources(2)
        gen = MockGenerator()
        sandbox = EvalSandbox(backend="mock")
        tasks = []
        for pid in ds.get_problem_ids():
            work = WorkItem(pid, 1, ds.get_problem_path_by_id(pid))
            tasks.append(run_single_work(cfg, work, gen, sandbox, res))
        await asyncio.gather(*tasks)

    asyncio.run(go())
    assert 1 <= max_busy <= 2


# ----------------------------------------------------------------------
# reasoning-model knobs reach the generation request
# (reference query_server contract, state_machine.py:238-241)
# ----------------------------------------------------------------------

class _RecordingGenerator(MockGenerator):
    def __init__(self):
        super().__init__()
        self.requests = []

    async def generate(self, request):
        self.requests.append(request)
        return await super().generate(request)


def test_reasoning_knobs_map_to_eos_deferral(tmp_path):
    cfg = make_cfg(
        tmp_path, max_k=1, reasoning_model=True,
        reasoning_budget_tokens=512, reasoning_effort="high",
    )
    gen = _RecordingGenerator()
    run_one(cfg, softmax_work(), gen)
    req = gen.requests[0]
    assert req.min_tokens == 512  # explicit budget wins
    assert req.reasoning_effort == "high"


def test_reasoning_effort_without_budget_scales_max_tokens(tmp_path):
    cfg = make_cfg(
        tmp_path, max_k=1, reasoning_model=True, reasoning_effort="low",
        max_tokens=4096,
    )
    gen = _RecordingGenerator()
    run_one(cfg, softmax_work(), gen)
    assert gen.requests[0].min_tokens == 4096 // 8


def test_non_reasoning_run_keeps_default_floor(tmp_path):
    cfg = make_cfg(tmp_path, max_k=1, reasoning_effort="high")  # model off
    gen = _RecordingGenerator()
    run_one(cfg, softmax_work(), gen)
    assert gen.requests[0].min_tokens == 1
    assert gen.requests[0].reasoning_effort == ""


def test_http_generator_payload_carries_full_contract():
    """top_k/seed/min_tokens/reasoning_effort must reach the wire (the
    reference forwarded all of these through query_server)."""
    from caesar_tpu.harness.generate import GenerateRequest, HttpGenerator

    gen = HttpGenerator("localhost", 1, "m")
    captured = {}

    def fake_post(payload):
        captured.update(payload)
        return {"choices": [{"message": {"content": "hi"}}], "usage": {}}

    gen._post = fake_post
    req = GenerateRequest(
        prompt="p", temperature=0.5, top_p=0.9, top_k=7, max_tokens=64,
        min_tokens=16, reasoning_effort="medium", seed=3,
    )
    asyncio.run(gen.generate(req))
    assert captured["top_k"] == 7
    assert captured["seed"] == 3
    assert captured["min_tokens"] == 16
    assert captured["reasoning_effort"] == "medium"
