import json

from caesar_tpu.evalkit.result import KernelExecResult
from caesar_tpu.harness.journal import TurnJournal
from caesar_tpu.harness.turn_info import TrajectoryInfo


def make_info(turn=1, **kw):
    info = TrajectoryInfo()
    rec = info.turn(turn)
    rec.prompt = kw.get("prompt", "p")
    rec.model_response = kw.get("model_response", "r")
    rec.token_usage = kw.get("token_usage", {"input_tokens": 10, "output_tokens": 5})
    rec.kernel_code = kw.get("kernel_code", "k")
    rec.eval_result = kw.get("eval_result", KernelExecResult(compiled=True, runtime=1.5))
    rec.profiler_result = kw.get("profiler_result", "table")
    return info


def test_config_written_at_init(tmp_path):
    TurnJournal(tmp_path / "j", config_dict={"run_name": "x"})
    cfg = json.loads((tmp_path / "j" / "config.json").read_text())
    assert cfg == {"run_name": "x"}


def test_save_load_roundtrip(tmp_path):
    j = TurnJournal(tmp_path / "j", config_dict={})
    j.update_turn_and_save(1, make_info(1))
    j2 = TurnJournal(tmp_path / "j")
    j2.load()
    assert 1 in j2.current_log
    res = j2.current_log[1]["eval_result"]
    assert isinstance(res, KernelExecResult)
    assert res.compiled is True
    assert res.runtime == 1.5
    assert j2.current_log[1]["token_usage"]["input_tokens"] == 10


def test_token_usage_saved_even_with_empty_response(tmp_path):
    """Regression guard for the reference bug (logger.py:94) that dropped
    token usage whenever model_response was empty."""
    j = TurnJournal(tmp_path / "j", config_dict={})
    info = make_info(1, model_response="", token_usage={"output_tokens": 7})
    j.update_turn_and_save(1, info)
    j2 = TurnJournal(tmp_path / "j")
    j2.load()
    assert j2.current_log[1]["token_usage"] == {"output_tokens": 7}


def test_merge_preserves_existing_fields(tmp_path):
    j = TurnJournal(tmp_path / "j", config_dict={})
    j.update_turn(1, make_info(1, prompt="first"))
    # second update with empty prompt must not clobber
    info2 = make_info(1, prompt="")
    j.update_turn(1, info2)
    assert j.current_log[1]["prompt"] == "first"


def test_atomic_write_never_leaves_partial_file(tmp_path):
    j = TurnJournal(tmp_path / "j", config_dict={})
    j.update_turn_and_save(1, make_info(1))
    # the tmp file must be gone after a successful save
    leftovers = [p for p in (tmp_path / "j").iterdir() if p.name.endswith(".tmp")]
    assert leftovers == []
    # and log.json must be valid JSON
    json.loads((tmp_path / "j" / "log.json").read_text())


def test_done_protocol(tmp_path):
    j = TurnJournal(tmp_path / "j", config_dict={})
    assert not j.is_done()
    j.mark_done()
    assert j.is_done()
    assert (tmp_path / "j" / "DONE").read_text() == ""


def test_clean_does_not_touch_disk(tmp_path):
    j = TurnJournal(tmp_path / "j", config_dict={})
    j.update_turn_and_save(1, make_info(1))
    j.clean()
    assert j.current_log == {}
    j2 = TurnJournal(tmp_path / "j")
    j2.load()
    assert 1 in j2.current_log
