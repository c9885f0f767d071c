"""HF-checkpoint integration: a synthesized safetensors dir drives the full
stack — load_hf_checkpoint → Engine → trajectory journal (VERDICT r1 item 8:
loader and engine were previously only joined via random-init presets).

The checkpoint is the tiny spec written in real HF Qwen2 naming ([out, in]
projection layout, sharded across two .safetensors files), so the loader's
transpose/shard-indexing/bias handling is exercised exactly as a downloaded
Qwen checkpoint would.
"""

import asyncio
import json

import numpy as np
import pytest

import jax.numpy as jnp

from caesar_tpu.config import EngineConfig, default_test_config
from caesar_tpu.engine.engine import Engine
from caesar_tpu.engine.model import get_spec
from caesar_tpu.engine.tokenizer import ByteTokenizer
from caesar_tpu.engine.weights import init_params, load_hf_checkpoint
from caesar_tpu.harness.generate import GenerateRequest

TINY = get_spec("tiny")


@pytest.fixture(scope="module")
def tiny_params():
    return init_params(TINY, seed=0, dtype=jnp.float32)


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory, tiny_params):
    """Write tiny_params as a 2-shard HF Qwen2 safetensors checkpoint."""
    from safetensors.numpy import save_file

    d = tmp_path_factory.mktemp("tiny_ckpt")
    (d / "config.json").write_text(
        json.dumps(
            {
                "model_type": "qwen2",
                "vocab_size": TINY.vocab,
                "hidden_size": TINY.dim,
                "num_hidden_layers": TINY.n_layers,
                "num_attention_heads": TINY.n_heads,
                "num_key_value_heads": TINY.n_kv_heads,
                "intermediate_size": TINY.hidden,
                "rope_theta": TINY.rope_theta,
                "rms_norm_eps": TINY.rms_eps,
                "tie_word_embeddings": True,
            }
        )
    )

    def np32(x):
        # ascontiguousarray: safetensors writes the RAW buffer, so a
        # transposed view would be saved with swapped shape but unmoved data
        return np.ascontiguousarray(np.asarray(x, dtype=np.float32))

    shards = [dict(), dict()]
    shards[0]["model.embed_tokens.weight"] = np32(tiny_params["embed"])
    shards[1]["model.norm.weight"] = np32(tiny_params["ln_out"])
    names = {
        "wq": "self_attn.q_proj.weight",
        "wk": "self_attn.k_proj.weight",
        "wv": "self_attn.v_proj.weight",
        "wo": "self_attn.o_proj.weight",
    }
    bias_names = {
        "bq": "self_attn.q_proj.bias",
        "bk": "self_attn.k_proj.bias",
        "bv": "self_attn.v_proj.bias",
    }
    for i, layer in enumerate(tiny_params["layers"]):
        shard = shards[i % 2]  # split layers across shards
        p = f"model.layers.{i}."
        for key, hf in names.items():
            shard[p + hf] = np32(np.asarray(layer[key]).T)  # HF stores [out, in]
        for key, hf in bias_names.items():
            shard[p + hf] = np32(layer[key])
        shard[p + "mlp.gate_proj.weight"] = np32(np.asarray(layer["mlp"]["gate"]).T)
        shard[p + "mlp.up_proj.weight"] = np32(np.asarray(layer["mlp"]["up"]).T)
        shard[p + "mlp.down_proj.weight"] = np32(np.asarray(layer["mlp"]["down"]).T)
        shard[p + "input_layernorm.weight"] = np32(layer["ln_attn"])
        shard[p + "post_attention_layernorm.weight"] = np32(layer["ln_mlp"])
    save_file(shards[0], d / "model-00001-of-00002.safetensors")
    save_file(shards[1], d / "model-00002-of-00002.safetensors")
    return d


def test_loader_round_trips_hf_layout(ckpt_dir, tiny_params):
    spec, params = load_hf_checkpoint(ckpt_dir, dtype=jnp.float32)
    assert spec.dim == TINY.dim
    assert spec.n_kv_heads == TINY.n_kv_heads
    assert spec.attn_bias and spec.tie_embeddings
    np.testing.assert_allclose(
        np.asarray(params["layers"][1]["wq"]),
        np.asarray(tiny_params["layers"][1]["wq"]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["mlp"]["down"]),
        np.asarray(tiny_params["layers"][0]["mlp"]["down"]),
        rtol=1e-6,
    )


def _engine(ckpt_or_params, tiny_params, **over):
    econf_kw = dict(
        model="tiny", quant="bf16", kv_quant="f32", page_size=16,
        num_pages=256, max_batch=4, max_seq_len=256, prefill_chunk=32,
        prefix_cache=False,
    )
    econf_kw.update(over)
    if isinstance(ckpt_or_params, dict):
        return Engine(
            EngineConfig(**econf_kw), spec=TINY, params=ckpt_or_params,
            tokenizer=ByteTokenizer(), decode_steps=4,
        )
    econf_kw["model"] = str(ckpt_or_params)
    return Engine(
        EngineConfig(**econf_kw), tokenizer=ByteTokenizer(), decode_steps=4,
    )


def test_checkpoint_engine_matches_params_engine(ckpt_dir, tiny_params):
    """The engine serving the LOADED checkpoint must produce the same
    greedy output as one built from the original params tree."""
    req = GenerateRequest(
        prompt="checkpoint parity", temperature=0.0, max_tokens=10,
        trajectory_id="ck",
    )
    ref = _engine(tiny_params, tiny_params)
    try:
        expected = ref.generate_sync(req).text
    finally:
        ref.close()

    # NB: engine from a checkpoint DIR exercises load_model's dir branch
    loaded = _engine(ckpt_dir, tiny_params)
    try:
        assert loaded.generate_sync(req).text == expected
    finally:
        loaded.close()


def test_checkpoint_quantized_engine_serves(ckpt_dir, tiny_params):
    """Host-side quantization of a loaded checkpoint (the real 7B flow)."""
    engine = _engine(ckpt_dir, tiny_params, quant="int8")
    try:
        r = engine.generate_sync(
            GenerateRequest(prompt="int8 ckpt", temperature=0.0,
                            max_tokens=6, trajectory_id="q")
        )
        assert r.token_usage["completion_tokens"] >= 1
    finally:
        engine.close()


def test_checkpoint_to_trajectory_journal(ckpt_dir, tiny_params, tmp_path):
    """One sweep: checkpoint dir → Engine → EngineGenerator → state machine
    → journal on disk (the reference's full GENERATE-state path with our
    own serving stack underneath)."""
    from caesar_tpu.engine.service import EngineGenerator
    from caesar_tpu.evalkit.dataset import resolve_dataset
    from caesar_tpu.evalkit.sandbox import EvalSandbox
    from caesar_tpu.harness.driver import run_single_work
    from caesar_tpu.harness.resources import SliceResourceManager
    from caesar_tpu.harness.work import WorkItem

    cfg = default_test_config(
        log_dir_prefix=str(tmp_path / "logs"),
        build_dir_prefix=str(tmp_path / "build"),
        max_k=1,
        max_tokens=16,
        backend="engine",
        eval_backend="mock",
    )
    # the real harness prompt is ~3k tokens under the byte tokenizer
    engine = _engine(
        ckpt_dir, tiny_params,
        max_seq_len=4096, num_pages=384, prefill_chunk=256,
    )
    gen = EngineGenerator([engine])
    ds = resolve_dataset("kernelbench-tpu/level1-test")
    work = WorkItem(23, 1, ds.get_problem_path_by_id(23))

    async def go():
        return await run_single_work(
            cfg, work,
            gen,
            EvalSandbox(backend="mock"),
            SliceResourceManager(1),
        )

    try:
        stm = asyncio.run(go())
        log = json.loads(stm.journal.log_file.read_text())
        rec = log["1"]
        assert rec["prompt"]
        assert rec["model_response"] is not None
        assert rec["token_usage"]["prompt_tokens"] > 0
        assert rec["token_usage"]["completion_tokens"] >= 1
    finally:
        asyncio.run(gen.close())
