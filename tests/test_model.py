"""Model correctness: logits parity vs transformers' Qwen2, quant behavior,
sampling semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from caesar_tpu.engine import quant as quant_lib
from caesar_tpu.engine.model import ModelSpec, forward_cacheless, get_spec
from caesar_tpu.engine.sampling import sample_tokens
from caesar_tpu.engine.weights import init_params

TINY = get_spec("tiny")


def hf_tiny_model_and_params():
    """Build a tiny transformers Qwen2 with random weights and convert its
    state dict into our params tree (f32 both sides for tight parity)."""
    import torch
    from transformers import Qwen2Config
    from transformers.models.qwen2.modeling_qwen2 import Qwen2ForCausalLM

    config = Qwen2Config(
        vocab_size=TINY.vocab,
        hidden_size=TINY.dim,
        num_hidden_layers=TINY.n_layers,
        num_attention_heads=TINY.n_heads,
        num_key_value_heads=TINY.n_kv_heads,
        intermediate_size=TINY.hidden,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_eps,
        tie_word_embeddings=True,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(config).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    def t(key):
        return jnp.asarray(sd[key].T, dtype=jnp.float32)

    def v(key):
        return jnp.asarray(sd[key], dtype=jnp.float32)

    layers = []
    for i in range(TINY.n_layers):
        p = f"model.layers.{i}."
        layers.append(
            {
                "ln_attn": v(p + "input_layernorm.weight"),
                "ln_mlp": v(p + "post_attention_layernorm.weight"),
                "wq": t(p + "self_attn.q_proj.weight"),
                "wk": t(p + "self_attn.k_proj.weight"),
                "wv": t(p + "self_attn.v_proj.weight"),
                "wo": t(p + "self_attn.o_proj.weight"),
                "bq": v(p + "self_attn.q_proj.bias"),
                "bk": v(p + "self_attn.k_proj.bias"),
                "bv": v(p + "self_attn.v_proj.bias"),
                "mlp": {
                    "gate": t(p + "mlp.gate_proj.weight"),
                    "up": t(p + "mlp.up_proj.weight"),
                    "down": t(p + "mlp.down_proj.weight"),
                },
            }
        )
    params = {
        "embed": v("model.embed_tokens.weight"),
        "layers": layers,
        "ln_out": v("model.norm.weight"),
    }
    return hf, params


def test_logits_parity_with_transformers_qwen2():
    import torch

    hf, params = hf_tiny_model_and_params()
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, TINY.vocab, size=(2, 17))

    with torch.no_grad():
        expected = hf(torch.tensor(tokens)).logits.numpy()
    got = np.asarray(forward_cacheless(TINY, params, jnp.asarray(tokens)))

    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=2e-3)


def test_forward_shapes_random_init():
    params = init_params(TINY, seed=0)
    tokens = jnp.zeros((3, 9), dtype=jnp.int32)
    logits = forward_cacheless(TINY, params, tokens)
    assert logits.shape == (3, 9, TINY.vocab)
    assert logits.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_untied_head_path():
    spec = ModelSpec(
        "tiny-untied", vocab=128, dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
        head_dim=16, hidden=64, attn_bias=False, tie_embeddings=False,
    )
    params = init_params(spec, seed=0)
    assert "unembed" in params
    logits = forward_cacheless(spec, params, jnp.zeros((1, 4), dtype=jnp.int32))
    assert logits.shape == (1, 4, 128)


# ----------------------------------------------------------------------
# quantization
# ----------------------------------------------------------------------

@pytest.mark.parametrize("bits,tol", [(8, 0.01), (4, 0.08)])
def test_quant_dequant_error_bounded(bits, tol):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 128), dtype=np.float32) * 0.05
    q = quant_lib.quantize_weight(w, bits=bits, group=128)
    back = np.asarray(quant_lib.dequantize(q, dtype=jnp.float32))
    scale = np.abs(w).max()
    assert np.abs(back - w).max() <= tol * scale


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_matmul_close_to_dense(bits):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 256), dtype=np.float32) * 0.1)
    w = rng.standard_normal((256, 64), dtype=np.float32) * 0.05
    q = quant_lib.quantize_weight(w, bits=bits, group=64)
    dense = np.asarray(x @ w)
    quantized = np.asarray(quant_lib.quantized_matmul(x, q))
    rel = np.abs(quantized - dense).max() / (np.abs(dense).max() + 1e-9)
    assert rel < (0.02 if bits == 8 else 0.15)


def test_quantized_model_forward_close():
    params = init_params(TINY, seed=0, dtype=jnp.float32)
    tokens = jnp.asarray(
        np.random.default_rng(2).integers(0, TINY.vocab, size=(1, 12))
    )
    dense_logits = np.asarray(forward_cacheless(TINY, params, tokens))
    q_params = quant_lib.quantize_params(params, bits=8, group=32)
    q_logits = np.asarray(forward_cacheless(TINY, q_params, tokens))
    # compare top-1 prediction agreement + bounded drift
    assert (
        np.argmax(q_logits, -1) == np.argmax(dense_logits, -1)
    ).mean() > 0.9
    drift = np.abs(q_logits - dense_logits).max() / np.abs(dense_logits).max()
    assert drift < 0.2


def test_quantized_linear_is_pytree_leaf_pair():
    q = quant_lib.quantize_weight(np.ones((64, 32), np.float32), bits=8, group=32)
    leaves = jax.tree.leaves(q)
    assert len(leaves) == 2  # qweight + scales flow through jit


# ----------------------------------------------------------------------
# sampling
# ----------------------------------------------------------------------

def _sample(logits, temperature, top_k=0, top_p=1.0, seed=0):
    batch = logits.shape[0]
    return np.asarray(
        sample_tokens(
            jnp.asarray(logits, dtype=jnp.float32),
            jax.random.PRNGKey(seed),
            jnp.full((batch,), temperature, dtype=jnp.float32),
            jnp.full((batch,), top_k, dtype=jnp.int32),
            jnp.full((batch,), top_p, dtype=jnp.float32),
        )
    )


def test_greedy_sampling():
    logits = np.array([[0.0, 5.0, 1.0], [9.0, 0.0, 0.0]], np.float32)
    assert _sample(logits, temperature=0.0).tolist() == [1, 0]


def test_topk_restricts_support():
    logits = np.array([[10.0, 9.0, -50.0, -50.0]] * 64, np.float32)
    out = _sample(logits, temperature=5.0, top_k=2, seed=3)
    assert set(out.tolist()) <= {0, 1}


def test_topp_restricts_support():
    # one dominant token: top_p=0.5 keeps only it
    logits = np.array([[10.0, 1.0, 1.0, 1.0]] * 64, np.float32)
    out = _sample(logits, temperature=1.0, top_p=0.5, seed=4)
    assert set(out.tolist()) == {0}


def test_mixed_greedy_and_sampled_batch():
    logits = np.array([[0.0, 3.0], [0.0, 3.0]], np.float32)
    out = sample_tokens(
        jnp.asarray(logits),
        jax.random.PRNGKey(0),
        jnp.asarray([0.0, 2.0]),
        jnp.asarray([0, 0], dtype=jnp.int32),
        jnp.asarray([1.0, 1.0]),
    )
    assert int(out[0]) == 1  # greedy row always argmax
