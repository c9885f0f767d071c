"""End-to-end: the trajectory harness driving the REAL serving engine.

The full production wiring on the tiny model: driver -> state machines ->
EngineGenerator -> continuous-batching engine (prefill/decode/prefix cache)
-> journal, with mock eval (the model is random-init; eval outcomes are not
the point — the data flow is).
"""

import asyncio
import json

import pytest

from caesar_tpu.config import default_test_config
from caesar_tpu.harness.driver import run_all
from caesar_tpu.harness.generate import make_generator


@pytest.mark.slow
def test_engine_backend_full_sweep(tmp_path):
    cfg = default_test_config(
        log_dir_prefix=str(tmp_path / "logs"),
        build_dir_prefix=str(tmp_path / "build"),
        backend="engine",
        eval_backend="mock",
        max_k=2,
        max_tokens=16,
        greedy_sample=True,
        num_workers=8,
        dataset_name="kernelbench-tpu/level1-test",
        num_samples=3,
    )
    cfg.apply_override("engine.model", "tiny")
    cfg.apply_override("engine.max_seq_len", 4096)
    cfg.apply_override("engine.page_size", 64)
    cfg.apply_override("engine.num_pages", 2048)
    cfg.apply_override("engine.max_batch", 4)

    generator = make_generator(cfg)
    try:
        stats = asyncio.run(run_all(cfg, generator=generator, progress_interval=0))
        assert stats["failed"] == []
        assert stats["trajectories"] == 3

        run_dir = tmp_path / "logs" / "test_group" / "test_run"
        for sample in (1, 2, 3):
            log = json.loads(
                (run_dir / "problem_23" / f"sample_{sample}" / "log.json").read_text()
            )
            for turn in ("1", "2"):
                rec = log[turn]
                assert rec["prompt"]
                # NOTE: model_response text may be empty — the tiny test
                # model's vocab (512) exceeds the byte tokenizer's decodable
                # range, so sampled ids can all fall outside 0..255.  Token
                # accounting is the ground truth here.
                usage = rec["token_usage"]
                assert usage["prompt_tokens"] > 100
                assert usage["completion_tokens"] >= 1

        engine = generator.engines[0]
        snap = engine.stats.snapshot(engine.prefix_cache)
        assert snap["completed"] == 6  # 3 samples x 2 turns
        # the three samples share the problem's initial-prompt prefix, and
        # turn-2 prompts share turn-1's entire prefix: reuse must happen
        assert snap["prefix_hit_rate"] > 0
    finally:
        asyncio.run(generator.close())
