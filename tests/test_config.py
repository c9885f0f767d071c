import pytest

from caesar_tpu.config import RunConfig, default_test_config
from caesar_tpu.harness.strategy import Strategy


def base_args():
    return [
        "run_group=g",
        "run_name=n",
        'prompt_strategy=["SHOW_INLINE_SYNTAX","PROFILER_FEEDBACK"]',
    ]


def test_cli_key_value_overrides():
    cfg = RunConfig.from_cli(base_args() + ["max_k=5", "temperature=0.7"])
    assert cfg.max_k == 5
    assert cfg.temperature == 0.7
    assert cfg.run_group == "g"


def test_strategy_parsing():
    cfg = RunConfig.from_cli(base_args())
    assert cfg.prompt_strategy == {
        Strategy.SHOW_INLINE_SYNTAX,
        Strategy.PROFILER_FEEDBACK,
    }


def test_nested_engine_overrides():
    cfg = RunConfig.from_cli(base_args() + ["engine.quant=int8", "engine.tp=4"])
    assert cfg.engine.quant == "int8"
    assert cfg.engine.tp == 4


def test_missing_required_fields_rejected():
    with pytest.raises(ValueError, match="required"):
        RunConfig.from_cli(["run_group=g"])


def test_unknown_key_rejected():
    with pytest.raises(AttributeError):
        RunConfig.from_cli(base_args() + ["no_such_key=1"])


def test_unknown_strategy_rejected():
    with pytest.raises(ValueError, match="Unknown strategy"):
        RunConfig.from_cli(
            ["run_group=g", "run_name=n", 'prompt_strategy=["NOPE"]']
        )


def test_mock_preset():
    cfg = RunConfig.from_cli([".mock", "run_group=g", "run_name=n"])
    assert cfg.backend == "mock"
    assert cfg.eval_backend == "mock"
    assert cfg.max_k == 1


def test_int8_preset_sets_engine():
    cfg = RunConfig.from_cli(
        [".int8-7b", "run_group=g", "run_name=n",
         'prompt_strategy=["PROFILER_FEEDBACK"]']
    )
    assert cfg.engine.quant == "int8"
    assert cfg.engine.max_batch == 48
    assert cfg.num_workers == 48


def test_bad_enum_values_rejected():
    with pytest.raises(ValueError, match="context_mode"):
        RunConfig.from_cli(base_args() + ["context_mode=bogus"])
    with pytest.raises(ValueError, match="engine.quant"):
        RunConfig.from_cli(base_args() + ["engine.quant=int2"])


def test_to_dict_serializable():
    import json

    cfg = default_test_config()
    text = json.dumps(cfg.to_dict())
    assert "test_run" in text


def test_default_test_config_finalized():
    cfg = default_test_config(max_k=3)
    assert cfg.max_k == 3
    assert isinstance(cfg.prompt_strategy, set)
