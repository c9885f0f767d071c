"""Serving-engine tests on the tiny model (CPU, virtual devices).

The load-bearing test is greedy parity: the engine's paged-KV chunked
prefill + multi-step decode must reproduce, token for token, a naive
full-forward argmax loop over forward_cacheless.
"""

import asyncio

import numpy as np
import pytest

import jax.numpy as jnp

from caesar_tpu.config import EngineConfig
from caesar_tpu.engine.engine import Engine
from caesar_tpu.engine.model import forward_cacheless, get_spec
from caesar_tpu.engine.tokenizer import ByteTokenizer
from caesar_tpu.engine.weights import init_params
from caesar_tpu.harness.generate import GenerateRequest

TINY = get_spec("tiny")


def tiny_econf(**overrides):
    # f32 weights + f32 KV storage in parity tests: the tiny random-init
    # model has near-tie logits (gaps ~1e-2), and bf16 rounding differences
    # between the paged path and the dense reference can flip argmax.
    defaults = dict(
        model="tiny",
        quant="bf16",
        kv_quant="f32",
        page_size=16,
        num_pages=256,
        max_batch=4,
        max_seq_len=256,
        prefill_chunk=32,
        tp=1,
        dp=1,
        prefix_cache=True,
        seed=0,
    )
    defaults.update(overrides)
    return EngineConfig(**defaults)


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(TINY, seed=0, dtype=jnp.float32)


def make_engine(tiny_params, **overrides):
    decode_steps = overrides.pop("decode_steps", 4)
    econf = tiny_econf(**overrides)
    return Engine(
        econf,
        spec=TINY,
        params=tiny_params,
        tokenizer=ByteTokenizer(),
        decode_steps=decode_steps,
    )


def reference_greedy(params, prompt_ids, max_new, eos_id):
    """Naive full-forward argmax decode (the golden model)."""
    tokens = list(prompt_ids)
    out = []
    for _ in range(max_new):
        logits = forward_cacheless(
            TINY, params, jnp.asarray([tokens], dtype=jnp.int32)
        )
        nxt = int(np.argmax(np.asarray(logits[0, -1])))
        if nxt == eos_id:
            break
        out.append(nxt)
        tokens.append(nxt)
    return out


def greedy_request(prompt, max_tokens=12):
    return GenerateRequest(
        prompt=prompt, temperature=0.0, max_tokens=max_tokens,
        trajectory_id=prompt[:8],
    )


# ----------------------------------------------------------------------

def test_engine_greedy_matches_full_forward(tiny_params):
    engine = make_engine(tiny_params)
    try:
        tok = ByteTokenizer()
        prompt = "hello paged attention"
        result = engine.generate_sync(greedy_request(prompt, max_tokens=12))
        expected_ids = reference_greedy(
            tiny_params, tok.encode(prompt), 12, tok.eos_id
        )
        assert result.text == tok.decode(expected_ids)
        assert result.token_usage["prompt_tokens"] == len(tok.encode(prompt))
    finally:
        engine.close()


def test_engine_long_prompt_chunked_prefill(tiny_params):
    engine = make_engine(tiny_params)
    try:
        tok = ByteTokenizer()
        prompt = "x" * 150  # several 32-token prefill chunks, not page-aligned
        result = engine.generate_sync(greedy_request(prompt, max_tokens=8))
        expected_ids = reference_greedy(
            tiny_params, tok.encode(prompt), 8, tok.eos_id
        )
        assert result.text == tok.decode(expected_ids)
    finally:
        engine.close()


def test_engine_concurrent_batch(tiny_params):
    engine = make_engine(tiny_params)
    try:
        prompts = [f"prompt number {i}" for i in range(8)]  # > max_batch

        async def go():
            reqs = [engine.generate(greedy_request(p, max_tokens=6)) for p in prompts]
            return await asyncio.gather(*reqs)

        results = asyncio.run(go())
        assert len(results) == 8
        # greedy determinism: same prompt -> same output
        again = engine.generate_sync(greedy_request(prompts[0], max_tokens=6))
        assert again.text == results[0].text
    finally:
        engine.close()


def test_engine_prefix_cache_reuse(tiny_params):
    engine = make_engine(tiny_params)
    try:
        prompt = "shared prefix " * 8  # ~7 pages of 16
        first = engine.generate_sync(greedy_request(prompt, max_tokens=6))
        assert first.token_usage["cached_tokens"] == 0
        second = engine.generate_sync(greedy_request(prompt, max_tokens=6))
        assert second.token_usage["cached_tokens"] > 0
        assert second.text == first.text
        assert engine.prefix_cache.hit_rate > 0
    finally:
        engine.close()


def test_engine_prefix_cache_correctness_different_tails(tiny_params):
    """Shared prefix + different tails must not cross-contaminate."""
    engine = make_engine(tiny_params)
    try:
        base = "common prefix block " * 4
        r1 = engine.generate_sync(greedy_request(base + "tail one", 6))
        r2 = engine.generate_sync(greedy_request(base + "tail two!", 6))
        tok = ByteTokenizer()
        e1 = reference_greedy(tiny_params, tok.encode(base + "tail one"), 6, tok.eos_id)
        e2 = reference_greedy(tiny_params, tok.encode(base + "tail two!"), 6, tok.eos_id)
        assert r1.text == tok.decode(e1)
        assert r2.text == tok.decode(e2)
    finally:
        engine.close()


def test_engine_fp8_kv_cache_runs(tiny_params):
    engine = make_engine(tiny_params, kv_quant="fp8")
    try:
        result = engine.generate_sync(greedy_request("fp8 kv check", 8))
        assert result.token_usage["completion_tokens"] >= 1
    finally:
        engine.close()


def test_engine_pages_released_after_completion(tiny_params):
    engine = make_engine(tiny_params, prefix_cache=False)
    try:
        used_before = engine.allocator.used_pages
        engine.generate_sync(greedy_request("page accounting", 8))
        assert engine.allocator.used_pages == used_before
    finally:
        engine.close()


def test_engine_sampled_generation_runs(tiny_params):
    engine = make_engine(tiny_params)
    try:
        req = GenerateRequest(
            prompt="sample me", temperature=1.0, top_k=50, top_p=0.95,
            max_tokens=10, trajectory_id="s1",
        )
        result = engine.generate_sync(req)
        assert result.token_usage["completion_tokens"] >= 1
    finally:
        engine.close()


def test_engine_max_tokens_cap(tiny_params):
    engine = make_engine(tiny_params)
    try:
        result = engine.generate_sync(greedy_request("cap", max_tokens=3))
        assert result.token_usage["completion_tokens"] <= 3
    finally:
        engine.close()


# ----------------------------------------------------------------------
# tensor-parallel parity on the virtual CPU mesh
# ----------------------------------------------------------------------

def test_engine_tp2_matches_single_device(tiny_params):
    from caesar_tpu.parallel.plan import make_mesh

    single = make_engine(tiny_params)
    try:
        expected = single.generate_sync(greedy_request("tensor parallel", 8))
    finally:
        single.close()

    econf = tiny_econf(tp=2)
    sharded = Engine(
        econf,
        spec=TINY,
        params=tiny_params,
        tokenizer=ByteTokenizer(),
        decode_steps=4,
        mesh=make_mesh(2),
    )
    try:
        got = sharded.generate_sync(greedy_request("tensor parallel", 8))
        assert got.text == expected.text
    finally:
        sharded.close()


def test_engine_tp2_paged_kernel_matches_xla_path(monkeypatch):
    """The Pallas paged-attention kernel under TP=2 shard_map (interpret
    mode on CPU) is token-identical to the single-device XLA gather path.
    Needs a head_dim-128 spec — the kernel's Mosaic lane constraint."""
    from caesar_tpu.engine.model import ModelSpec
    from caesar_tpu.parallel.plan import make_mesh

    spec = ModelSpec(
        "kernel-tiny", vocab=512, dim=64, n_layers=2, n_heads=4,
        n_kv_heads=2, head_dim=128, hidden=128, rope_theta=1e4,
        tie_embeddings=True,
    )
    params = init_params(spec, seed=0, dtype=jnp.float32)

    single = Engine(
        tiny_econf(), spec=spec, params=params, tokenizer=ByteTokenizer(),
        decode_steps=4,
    )
    try:
        assert not single._use_paged_kernel  # CPU: XLA gather reference
        expected = single.generate_sync(greedy_request("kernel parity", 8))
    finally:
        single.close()

    monkeypatch.setenv("CAESAR_FORCE_PAGED_KERNEL", "1")
    sharded = Engine(
        tiny_econf(tp=2), spec=spec, params=params, tokenizer=ByteTokenizer(),
        decode_steps=4, mesh=make_mesh(2),
    )
    try:
        assert sharded._use_paged_kernel
        got = sharded.generate_sync(greedy_request("kernel parity", 8))
        assert got.text == expected.text
    finally:
        sharded.close()


def test_engine_tp2_microbatch_overlap_parity(tiny_params):
    """decode_microbatches>1 (collective-overlap pipelining of batch slices
    through the layer stack) must be token-identical to microbatches=1."""
    from caesar_tpu.parallel.plan import make_mesh

    outs = []
    for mb in (1, 2):
        eng = Engine(
            tiny_econf(tp=2, decode_microbatches=mb),
            spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
            decode_steps=4, mesh=make_mesh(2),
        )
        try:
            outs.append(
                eng.generate_sync(greedy_request("microbatch overlap", 8)).text
            )
        finally:
            eng.close()
    assert outs[0] == outs[1]


def test_engine_w8a8_tp2_matches_single_device(tiny_params):
    """w8a8 numerics under TP: the activation-quant mode must survive
    shard_params (round-1 regression dropped `act`) and the sharded int8
    pipeline must be token-identical to the single-device one."""
    from caesar_tpu.parallel.plan import make_mesh

    single = Engine(
        tiny_econf(quant="w8a8"),
        spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
        decode_steps=4,
    )
    try:
        assert single.params["layers"][0]["wqkv"].act == "int8"
        expected = single.generate_sync(greedy_request("w8a8 parallel", 8))
    finally:
        single.close()

    sharded = Engine(
        tiny_econf(quant="w8a8", tp=2),
        spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
        decode_steps=4, mesh=make_mesh(2),
    )
    try:
        assert sharded.params["layers"][0]["wq"].act == "int8"
        got = sharded.generate_sync(greedy_request("w8a8 parallel", 8))
        assert got.text == expected.text
    finally:
        sharded.close()


# ----------------------------------------------------------------------
# BASELINE config 4: INT4 weights + FP8 KV (+ TP) through the Engine
# ----------------------------------------------------------------------

def _reference_greedy_params(spec, params, prompt_ids, max_new, eos_id):
    """Full-forward argmax over ARBITRARY (possibly quantized) params —
    model.linear dispatches QuantizedLinear through the same
    quantized_matmul the engine serves with, so this is the exact
    dequantized-XLA-path reference for int4/int8 engines."""
    tokens = list(prompt_ids)
    out = []
    for _ in range(max_new):
        logits = forward_cacheless(
            spec, params, jnp.asarray([tokens], dtype=jnp.int32)
        )
        nxt = int(np.argmax(np.asarray(logits[0, -1])))
        if nxt == eos_id:
            break
        out.append(nxt)
        tokens.append(nxt)
    return out


def test_engine_int4_greedy_matches_dequantized_reference(tiny_params):
    """Engine(quant=int4) paged prefill+decode is token-identical to a naive
    full-forward over the SAME int4-quantized params (BASELINE config 4's
    weight path; VERDICT r2 item 3)."""
    from caesar_tpu.engine.quant import quantize_params
    from caesar_tpu.engine.weights import resolve_quant_group

    tok = ByteTokenizer()
    prompt = "int4 serving parity check"
    q4 = quantize_params(
        tiny_params, bits=4,
        group=resolve_quant_group("int4", -1),
    )
    expected = _reference_greedy_params(
        TINY, q4, tok.encode(prompt), 10, tok.eos_id
    )

    engine = make_engine(tiny_params, quant="int4")
    try:
        assert engine.params["layers"][0]["wqkv"].bits == 4
        result = engine.generate_sync(greedy_request(prompt, max_tokens=10))
        assert result.text == tok.decode(expected)
    finally:
        engine.close()


def test_engine_int4_tp2_matches_single_device(tiny_params):
    """INT4 under TP=2: row-parallel shards of the nibble-packed weight
    (exercising plan._refine_group's scale-row refinement) must be
    token-identical to single-device int4."""
    from caesar_tpu.parallel.plan import make_mesh

    single = make_engine(tiny_params, quant="int4")
    try:
        expected = single.generate_sync(greedy_request("int4 parallel", 8))
    finally:
        single.close()

    sharded = Engine(
        tiny_econf(quant="int4", tp=2),
        spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
        decode_steps=4, mesh=make_mesh(2),
    )
    try:
        down = sharded.params["layers"][0]["mlp"]["down"]
        assert down.bits == 4
        # tiny hidden=128, group 128 -> one scale row; TP=2 row-sharding
        # must have refined it to per-shard rows
        assert down.group < 128
        got = sharded.generate_sync(greedy_request("int4 parallel", 8))
        assert got.text == expected.text
    finally:
        sharded.close()


def test_engine_config4_int4_fp8_tp2_matches_single_device(tiny_params):
    """The BASELINE config-4 combination — INT4 weights + FP8 KV + tensor
    parallelism — served end-to-end: TP=2 output token-identical to the
    single-device int4+fp8 engine."""
    from caesar_tpu.parallel.plan import make_mesh

    single = make_engine(tiny_params, quant="int4", kv_quant="fp8")
    try:
        expected = single.generate_sync(
            greedy_request("config four: int4 weights, fp8 kv", 10)
        )
        assert expected.token_usage["completion_tokens"] >= 1
    finally:
        single.close()

    sharded = Engine(
        tiny_econf(quant="int4", kv_quant="fp8", tp=2),
        spec=TINY, params=tiny_params, tokenizer=ByteTokenizer(),
        decode_steps=4, mesh=make_mesh(2),
    )
    try:
        assert str(sharded.cache.k_pages.dtype) == "float8_e4m3fn"
        got = sharded.generate_sync(
            greedy_request("config four: int4 weights, fp8 kv", 10)
        )
        assert got.text == expected.text
    finally:
        sharded.close()


def test_engine_fp8_kv_bitop_decode_matches_xla_upcast(monkeypatch):
    """FP8 KV regression pin: the Pallas bit-op e4m3 decode path and the
    plain XLA upcast path read the SAME stored fp8 bytes, so the engine's
    greedy output must be byte-identical between them — any error in the
    bit-op expansion (sign/exponent/mantissa reassembly) flips tokens
    immediately.  (Exact parity vs f32 KV is not expected on a tiny
    random-init model: e4m3 carries ~2 decimal digits and the tiny model's
    argmax margins are ~1e-2.)  Needs the head_dim-128 spec — the kernel's
    Mosaic lane constraint."""
    from caesar_tpu.engine.model import ModelSpec

    spec = ModelSpec(
        "kernel-tiny", vocab=512, dim=64, n_layers=2, n_heads=4,
        n_kv_heads=2, head_dim=128, hidden=128, rope_theta=1e4,
        tie_embeddings=True,
    )
    params = init_params(spec, seed=0, dtype=jnp.float32)
    prompts = [
        "fp8 kv parity beta block " * 3, "zzz " * 10,
        "paged attention rocks", "0123456789", "fp8 exactness",
    ]

    def run(force_kernel):
        if force_kernel:
            monkeypatch.setenv("CAESAR_FORCE_PAGED_KERNEL", "1")
        else:
            monkeypatch.delenv("CAESAR_FORCE_PAGED_KERNEL", raising=False)
        eng = Engine(
            tiny_econf(kv_quant="fp8"), spec=spec, params=params,
            tokenizer=ByteTokenizer(), decode_steps=4,
        )
        try:
            assert eng._use_paged_kernel == force_kernel
            return [
                eng.generate_sync(greedy_request(p, max_tokens=8)).text
                for p in prompts
            ]
        finally:
            eng.close()

    xla = run(False)
    kernel = run(True)
    assert kernel == xla
    assert all(t for t in xla)  # every prompt produced tokens


def test_engine_fp8_kv_chunking_invariance(tiny_params):
    """FP8 KV output must be invariant to prefill chunk size and decode
    chunk length — the paged fp8 write path (chunk vs token writes) stores
    identical bytes either way."""
    outs = []
    for chunk, steps in ((32, 4), (64, 2)):
        eng = make_engine(
            tiny_params, kv_quant="fp8", prefill_chunk=chunk,
            decode_steps=steps,
        )
        try:
            outs.append(
                eng.generate_sync(
                    greedy_request("fp8 chunk invariance " * 4, 12)
                ).text
            )
        finally:
            eng.close()
    assert outs[0] == outs[1]


# ----------------------------------------------------------------------
# w4a8: int4 weights + int8 activations through the Engine
# ----------------------------------------------------------------------

def test_engine_w4a8_greedy_matches_quantized_reference(tiny_params):
    """Engine(quant=w4a8) is token-identical to the naive full-forward over
    the SAME w4a8-quantized params (model.linear dispatches both through
    quantized_matmul, so the int8-activation math matches exactly)."""
    from caesar_tpu.engine.quant import quantize_params
    from caesar_tpu.engine.weights import resolve_quant_group

    tok = ByteTokenizer()
    prompt = "w4a8 serving parity check"
    q4 = quantize_params(
        tiny_params, bits=4,
        group=resolve_quant_group("w4a8", -1), act="int8",
    )
    expected = _reference_greedy_params(
        TINY, q4, tok.encode(prompt), 10, tok.eos_id
    )

    engine = make_engine(tiny_params, quant="w4a8")
    try:
        wqkv = engine.params["layers"][0]["wqkv"]
        assert wqkv.bits == 4 and wqkv.act == "int8"
        result = engine.generate_sync(greedy_request(prompt, max_tokens=10))
        assert result.text == tok.decode(expected)
    finally:
        engine.close()


def test_engine_w4a8_tp2_matches_single_device():
    """w4a8 under TP=2 with PLANAR-packed leaves (head_dim-128 spec): the
    column shard of the planar packing and the 3D planar scales must be
    token-identical to single-device."""
    from caesar_tpu.engine.model import ModelSpec
    from caesar_tpu.parallel.plan import make_mesh

    spec = ModelSpec(
        "kernel-tiny", vocab=512, dim=64, n_layers=2, n_heads=4,
        n_kv_heads=2, head_dim=128, hidden=128, rope_theta=1e4,
        tie_embeddings=True,
    )
    params = init_params(spec, seed=0, dtype=jnp.float32)

    single = Engine(
        tiny_econf(quant="w4a8"), spec=spec, params=params,
        tokenizer=ByteTokenizer(), decode_steps=4,
    )
    try:
        wq = single.params["layers"][0]["wqkv"]
        assert wq.w4a8, "q/k/v (out=512) should planar-pack"
        expected = single.generate_sync(greedy_request("w4a8 parallel", 8))
    finally:
        single.close()

    sharded = Engine(
        tiny_econf(quant="w4a8", tp=2),
        spec=spec, params=params, tokenizer=ByteTokenizer(),
        decode_steps=4, mesh=make_mesh(2),
    )
    try:
        wq_sh = sharded.params["layers"][0]["wq"]
        assert wq_sh.w4a8 and wq_sh.scales.shape[-1] * 2 == 512
        # planar scales co-shard with the packed columns on the last axis
        assert wq_sh.scales.sharding.spec == (None, None, "tp")
        got = sharded.generate_sync(greedy_request("w4a8 parallel", 8))
        assert got.text == expected.text
    finally:
        sharded.close()


def test_engine_prefill_kernel_matches_xla_path(monkeypatch):
    """The prefill flash kernel (single device, interpret mode on CPU) is
    token-identical to the XLA score-materializing path, including chunked
    prompts that span several windows."""
    from caesar_tpu.engine.model import ModelSpec

    spec = ModelSpec(
        "kernel-tiny", vocab=512, dim=64, n_layers=2, n_heads=4,
        n_kv_heads=2, head_dim=128, hidden=128, rope_theta=1e4,
        tie_embeddings=True,
    )
    params = init_params(spec, seed=0, dtype=jnp.float32)
    prompt = "prefill kernel parity probe " * 8  # several 32-token chunks

    ref = Engine(
        tiny_econf(prefix_cache=False), spec=spec, params=params,
        tokenizer=ByteTokenizer(), decode_steps=4,
    )
    try:
        assert not ref._use_prefill_kernel  # CPU default: XLA path
        expected = ref.generate_sync(greedy_request(prompt, 8))
    finally:
        ref.close()

    monkeypatch.setenv("CAESAR_FORCE_PAGED_KERNEL", "1")
    forced = Engine(
        tiny_econf(prefix_cache=False), spec=spec, params=params,
        tokenizer=ByteTokenizer(), decode_steps=4,
    )
    try:
        assert forced._use_prefill_kernel
        got = forced.generate_sync(greedy_request(prompt, 8))
        assert got.text == expected.text
    finally:
        forced.close()
