import numpy as np
import jax.numpy as jnp

from caesar_tpu.engine.model import get_spec
from caesar_tpu.engine.quality import (
    kv_quality_report,
    perplexity,
    quant_quality_report,
    token_stream,
)
from caesar_tpu.engine.tokenizer import ByteTokenizer
from caesar_tpu.engine.weights import init_params

TINY = get_spec("tiny")
TEXTS = ["def add(a, b):\n    return a + b\n", "hello quantization world"]


def test_perplexity_finite_and_positive():
    params = init_params(TINY, seed=0, dtype=jnp.float32)
    ids = token_stream(ByteTokenizer(), TEXTS)
    ppl = perplexity(TINY, params, ids)
    assert np.isfinite(ppl)
    assert ppl > 1.0


def test_quant_deltas_small_and_ordered():
    params = init_params(TINY, seed=0, dtype=jnp.float32)
    ids = token_stream(ByteTokenizer(), TEXTS)
    report = quant_quality_report(TINY, params, ids, bits_list=(8, 4), group=32)
    assert np.isfinite(report["ppl_int8"])
    # int8 must track bf16 closely; int4 within a loose envelope
    assert abs(report["delta_int8"]) < 0.05
    assert abs(report["delta_w8a8"]) < 0.08  # act quant adds bounded error
    assert abs(report["delta_int4"]) < 0.5
    # int4 can't be (meaningfully) closer than int8
    assert abs(report["delta_int4"]) >= abs(report["delta_int8"]) * 0.2


def test_kv_dtype_deltas_small_and_ordered():
    """FP8 KV storage (BASELINE config 4) must cost bounded perplexity:
    bf16-KV tracks the full-precision model tightly, fp8-KV within a looser
    envelope, and fp8 is never (meaningfully) better than bf16."""
    params = init_params(TINY, seed=0, dtype=jnp.float32)
    ids = token_stream(ByteTokenizer(), TEXTS)
    report = kv_quality_report(TINY, params, ids)
    assert np.isfinite(report["ppl_kv_fp8"])
    assert abs(report["delta_kv_bf16"]) < 0.02
    assert abs(report["delta_kv_fp8"]) < 0.15
    assert abs(report["delta_kv_fp8"]) >= abs(report["delta_kv_bf16"]) * 0.5
