"""Page-pool pressure: admission control and preemption-by-recompute.

A deliberately tiny pool forces the scheduler to defer admissions and
preempt running sequences; every request must still complete, and greedy
outputs must be byte-identical to an unpressured engine (recomputed KV is
identical KV).
"""

import jax.numpy as jnp
import pytest

from caesar_tpu.engine.engine import Engine
from caesar_tpu.engine.model import get_spec
from caesar_tpu.engine.tokenizer import ByteTokenizer
from caesar_tpu.engine.weights import init_params
from caesar_tpu.harness.generate import GenerateRequest

from tests.test_engine import greedy_request, tiny_econf

TINY = get_spec("tiny")


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(TINY, seed=0, dtype=jnp.float32)


def run_batch(engine, prompts, max_tokens=24):
    futures = [
        engine.submit(greedy_request(p, max_tokens=max_tokens)) for p in prompts
    ]
    return [f.result(timeout=600) for f in futures]


def test_tiny_pool_still_completes_everything(tiny_params):
    prompts = [f"pressure prompt {i} " * 12 for i in range(6)]

    roomy = Engine(
        tiny_econf(num_pages=512, prefix_cache=False),
        spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
        decode_steps=4,
    )
    try:
        expected = [r.text for r in run_batch(roomy, prompts)]
    finally:
        roomy.close()

    # ~19 pages per sequence needed; 40-page pool can hold only ~2 at a time
    tight = Engine(
        tiny_econf(num_pages=40, prefix_cache=False, max_batch=4),
        spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
        decode_steps=4,
    )
    try:
        results = run_batch(tight, prompts)
        got = [r.text for r in results]
        assert got == expected
        assert all(r.token_usage["completion_tokens"] >= 1 for r in results)
    finally:
        tight.close()


def test_oversized_request_fails_cleanly(tiny_params):
    engine = Engine(
        tiny_econf(num_pages=16, prefix_cache=False),
        spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
        decode_steps=4,
    )
    try:
        # over-long prompt: fail loudly at submit (silent truncation would
        # drop the instruction tail and change the task)
        fut = engine.submit(
            GenerateRequest(prompt="x" * 2000, temperature=0.0, max_tokens=200)
        )
        with pytest.raises(ValueError, match="max_seq_len"):
            fut.result(timeout=120)
        # fits max_seq_len but can never fit the page pool: admission fails
        # the future instead of livelocking through preemption
        fut = engine.submit(
            GenerateRequest(prompt="y" * 200, temperature=0.0, max_tokens=55)
        )
        with pytest.raises(RuntimeError, match="KV pages"):
            fut.result(timeout=120)
        # the engine survives and serves the next request
        ok = engine.submit(greedy_request("small", max_tokens=4)).result(120)
        assert ok.token_usage["completion_tokens"] >= 1
    finally:
        engine.close()


def test_preemption_under_live_contention(tiny_params):
    """Long generations + a pool that cannot hold the full batch: the
    scheduler must preempt and recompute rather than dying."""
    engine = Engine(
        tiny_econf(num_pages=48, prefix_cache=False, max_batch=4,
                   max_seq_len=256),
        spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
        decode_steps=4,
    )
    try:
        prompts = [f"contention {i} " * 10 for i in range(5)]
        results = run_batch(engine, prompts, max_tokens=48)
        assert len(results) == 5
        assert engine._fatal is None
    finally:
        engine.close()


@pytest.mark.parametrize("num_pages", [34, 36, 38])
def test_decode_time_preemption_outputs_byte_identical(tiny_params, num_pages):
    """Force preemptions DURING decode (page extension hits OutOfPages mid-
    chunk) and require byte-identical greedy output vs an unpressured engine.

    This is the engine's core durability claim (reference analogue:
    crash-safe trajectory semantics, /root/reference/state_machine.py:91-158
    — a resumed trajectory replays to the same state).  Round-1 regression:
    a preempted sequence stayed in the emission list with slot=-1 and read
    out[-1] — another slot's row — appending foreign tokens.
    """
    prompts = [f"preempt probe {i} zz " * 6 for i in range(5)]
    max_tokens = 96

    roomy = Engine(
        tiny_econf(num_pages=512, prefix_cache=False, max_batch=4,
                   max_seq_len=256),
        spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
        decode_steps=4,
    )
    try:
        expected = [r.text for r in run_batch(roomy, prompts, max_tokens)]
    finally:
        roomy.close()

    tight = Engine(
        tiny_econf(num_pages=num_pages, prefix_cache=False, max_batch=4,
                   max_seq_len=256),
        spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
        decode_steps=4,
    )
    try:
        got = [r.text for r in run_batch(tight, prompts, max_tokens)]
        assert tight.stats.preemptions > 0, (
            "pool was not tight enough to exercise decode-time preemption"
        )
        assert got == expected
        assert tight._fatal is None
    finally:
        tight.close()
