"""Pallas fused dequant-matmul kernel vs the XLA dequant reference.

Runs in interpreter mode on CPU — same kernel logic as the Mosaic-compiled
TPU path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from caesar_tpu.engine.quant import dequantize, quantize_weight
from caesar_tpu.ops.quant_matmul import quant_matmul_pallas, supports


def make(bits, k=256, n=512, group=128, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.05
    return quantize_weight(w, bits=bits, group=group)


@pytest.mark.parametrize("bits", [8, 4])
def test_kernel_matches_xla_dequant(bits):
    q = make(bits)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 256), dtype=np.float32) * 0.1)
    expected = np.asarray(
        jnp.dot(
            x.astype(jnp.bfloat16),
            dequantize(q, dtype=jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    got = np.asarray(quant_matmul_pallas(x, q))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("bits", [8, 4])
def test_kernel_3d_batch(bits):
    q = make(bits)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 3, 256), dtype=np.float32) * 0.1)
    got = np.asarray(quant_matmul_pallas(x, q))
    assert got.shape == (2, 3, 512)
    flat = np.asarray(quant_matmul_pallas(x.reshape(6, 256), q)).reshape(2, 3, 512)
    np.testing.assert_allclose(got, flat, atol=1e-5)


def test_unaligned_m_padded():
    q = make(8)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((5, 256), dtype=np.float32) * 0.1)
    got = np.asarray(quant_matmul_pallas(x, q))
    assert got.shape == (5, 512)
    ref = np.asarray(quant_matmul_pallas(jnp.pad(x, ((0, 3), (0, 0))), q))[:5]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_unsupported_shapes_fall_back():
    q = make(8, k=256, n=100)  # n not divisible by BN tile
    assert not supports(q)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 256), np.float32))
    out = quant_matmul_pallas(x, q)
    assert out.shape == (2, 100)


def test_w8a8_kernel_matches_xla_emulation():
    """The w8a8 Pallas kernel (interpret mode) matches the exact XLA
    emulation (engine.quant._w8a8_matmul_xla) bit-for-bit up to f32
    accumulation order."""
    from caesar_tpu.engine.quant import _w8a8_matmul_xla

    q = make(8)
    q = __import__("dataclasses").replace(q, act="int8")
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((4, 256), dtype=np.float32) * 0.1)
    got = np.asarray(quant_matmul_pallas(x, q))
    ref = np.asarray(_w8a8_matmul_xla(x.astype(jnp.bfloat16), q))
    assert got.shape == ref.shape == (4, 512)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_w8a8_close_to_weight_only():
    """Activation int8 quantization adds only small error over weight-only."""
    q = make(8, k=512, n=512)
    q8a8 = __import__("dataclasses").replace(q, act="int8")
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((8, 512), dtype=np.float32) * 0.1)
    ref = np.asarray(quant_matmul_pallas(x, q))
    got = np.asarray(quant_matmul_pallas(x, q8a8))
    denom = np.abs(ref).mean() + 1e-6
    assert np.abs(got - ref).mean() / denom < 0.02


def test_w8a8_percolumn_kernel_matches_xla_emulation():
    """Per-column scales (group=0, the w8a8 serving default —
    weights.resolve_quant_group): one scale row, one dot per tile."""
    from caesar_tpu.engine.quant import _w8a8_matmul_xla

    q = make(8, k=512, n=512, group=0)
    assert q.scales.shape[0] == 1 and q.group == 512
    q = __import__("dataclasses").replace(q, act="int8")
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((4, 512), dtype=np.float32) * 0.1)
    got = np.asarray(quant_matmul_pallas(x, q))
    ref = np.asarray(_w8a8_matmul_xla(x.astype(jnp.bfloat16), q))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_resolve_quant_group_auto():
    from caesar_tpu.engine.weights import resolve_quant_group

    assert resolve_quant_group("w8a8") == 0  # per-column
    assert resolve_quant_group("w4a8") == 128  # grouped, rank-1 constrained
    assert resolve_quant_group("int8") == 128
    assert resolve_quant_group("int4") == 128
    assert resolve_quant_group("w4a8", 0) == 0  # explicit per-column
    assert resolve_quant_group("w8a8", 64) == 64  # explicit override
    assert resolve_quant_group("int8", 0) == 0


def test_w8a8_load_model_tags_tree():
    from caesar_tpu.engine.quant import QuantizedLinear
    from caesar_tpu.engine.weights import load_model

    spec, params = load_model("tiny", quant="w8a8")
    import jax

    leaves = [
        l for l in jax.tree_util.tree_leaves(
            params, is_leaf=lambda n: isinstance(n, QuantizedLinear)
        )
        if isinstance(l, QuantizedLinear)
    ]
    assert leaves and all(l.act == "int8" for l in leaves)


@pytest.mark.parametrize("bits", [8, 4])
def test_kernel_large_int_values_roundtrip(bits):
    """Extremes of the int range dequantize correctly through the kernel."""
    k, n, group = 128, 256, 128
    qmax = 127 if bits == 8 else 7
    rng = np.random.default_rng(5)
    w = rng.choice([-1.0, 1.0], size=(k, n)).astype(np.float32)  # hits +-qmax
    q = quantize_weight(w, bits=bits, group=group)
    x = jnp.asarray(np.eye(8, k, dtype=np.float32))
    got = np.asarray(quant_matmul_pallas(x, q))
    np.testing.assert_allclose(got, w[:8], atol=0.2)


def test_w8a8_percolumn_routes_to_kernel(monkeypatch):
    """Regression (round-2 perf gap): per-column w8a8 must reach the Pallas
    kernel — _tiles_for's group-multiple constraint can never be met when
    group == k, and gating on it sent the serving default to the XLA
    dequant fallback."""
    import numpy as np
    from caesar_tpu.ops import quant_matmul as qm
    from caesar_tpu.engine.quant import quantize_weight

    q = quantize_weight(
        np.random.default_rng(0).standard_normal((256, 256)).astype("f"),
        8, group=0, act="int8",
    )
    calls = []
    orig = qm._w8a8_matmul

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(qm, "_w8a8_matmul", spy)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 256)), jnp.bfloat16
    )
    qm.quant_matmul_pallas(x, q)
    assert calls, "per-column w8a8 fell back off the kernel path"


# ----------------------------------------------------------------------
# w4a8: int4 weights, int8 activations (column-planar biased packing)
# ----------------------------------------------------------------------

def _mk_w4a8(k=256, n=256, group=128, seed=0, rank1=None):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((k, n), dtype=np.float32) * 0.05
    return w, quantize_weight(w, bits=4, group=group, act="int8",
                              rank1=rank1)


def test_w4a8_packing_dequantizes_to_plain_int4():
    """The biased column-planar packing is a pure re-encoding: dequantize
    must reproduce the row-interleaved int4 weights bit-for-bit."""
    w, q = _mk_w4a8()
    assert q.w4a8 and q.qweight.shape == (256, 128)
    assert q.scales.shape == (2, 2, 128)
    plain = quantize_weight(w, bits=4, group=128, act="none")
    np.testing.assert_array_equal(
        np.asarray(dequantize(q)), np.asarray(dequantize(plain))
    )


@pytest.mark.parametrize("group", [128, 0])
def test_w4a8_kernel_matches_xla_int8_path(group):
    """Kernel (interpret) vs the XLA int8-activation reference: identical
    integer math (biased dots + rowsum correction == signed dots), so the
    outputs agree to f32 rounding."""
    from caesar_tpu.engine.quant import _w8a8_matmul_xla

    _, q = _mk_w4a8(group=group)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 256)), jnp.bfloat16)
    ref = np.asarray(_w8a8_matmul_xla(x, q))
    got = np.asarray(quant_matmul_pallas(x, q))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_w4a8_kernel_odd_m_padding():
    _, q = _mk_w4a8()
    rng = np.random.default_rng(2)
    x3 = jnp.asarray(rng.standard_normal((3, 5, 256)), jnp.bfloat16)
    from caesar_tpu.engine.quant import _w8a8_matmul_xla

    ref = np.asarray(_w8a8_matmul_xla(x3, q))
    got = np.asarray(quant_matmul_pallas(x3, q))
    assert got.shape == ref.shape == (3, 5, 256)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_w4a8_fuse_concat_is_true_order():
    """fuse_params-style out-dim concat of planar weights must equal the
    quantization of each part — planar blocks are position-independent."""
    from caesar_tpu.engine.quant import _concat_out

    w1, q1 = _mk_w4a8(n=256, seed=3)
    w2, q2 = _mk_w4a8(n=128, seed=4)
    fused = _concat_out([q1, q2])
    d = np.asarray(dequantize(fused))
    np.testing.assert_array_equal(d[:, :256], np.asarray(dequantize(q1)))
    np.testing.assert_array_equal(d[:, 256:], np.asarray(dequantize(q2)))


# ----------------------------------------------------------------------
# large-M (prefill-shape) XLA routing
# ----------------------------------------------------------------------


def _large_m_cases():
    import dataclasses

    k, n = 256, 512
    cases = {}
    cases["w8a8_percol"] = dataclasses.replace(
        quantize_weight(
            np.random.default_rng(0).standard_normal((k, n), np.float32)
            * 0.05,
            bits=8, group=0, act="int8",
        ),
        act="int8",
    )
    cases["w8a8_grouped"] = quantize_weight(
        np.random.default_rng(1).standard_normal((k, n), np.float32) * 0.05,
        bits=8, group=128, act="int8",
    )
    cases["int8_weight_only"] = make(8)
    cases["w4a8_percol"] = quantize_weight(
        np.random.default_rng(2).standard_normal((k, n), np.float32) * 0.05,
        bits=4, group=0, act="int8",
    )
    return cases


@pytest.mark.parametrize("name", list(_large_m_cases().keys()))
def test_large_m_routes_to_xla_and_matches_reference(name):
    """Above the _XLA_M token threshold (prefill shapes) the fused kernels
    are bypassed for plain XLA dots — numerics must stay close to the
    dequantized bf16 reference for every quant mode."""
    q = _large_m_cases()[name]
    rng = np.random.default_rng(7)
    m = 300  # > _XLA_M default (256)
    x = jnp.asarray(rng.standard_normal((m, 256), dtype=np.float32) * 0.1)
    expected = np.asarray(
        jnp.dot(
            x.astype(jnp.bfloat16),
            dequantize(q, dtype=jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    got = np.asarray(quant_matmul_pallas(x, q))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=8e-2, rtol=8e-2)


def test_large_m_w8a8_percol_bit_identical_to_kernel_math():
    """The per-column int8 XLA dot must reproduce the Pallas per-column
    kernel's math EXACTLY (raw int32 accumulation, two f32 rescales) —
    prefill (XLA path) and decode (kernel path) then agree bit-for-bit."""
    from caesar_tpu.engine.quant import _w8a8_matmul_xla

    q = _large_m_cases()["w8a8_percol"]
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((300, 256), dtype=np.float32) * 0.1)
    got = np.asarray(quant_matmul_pallas(x, q))
    ref = np.asarray(_w8a8_matmul_xla(x.astype(jnp.bfloat16), q))
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_w8a8_percol_fused_bf16_out_matches_unfused():
    """out_dtype=bf16 on the per-column w8a8 path fuses the per-token
    rescale into the kernel epilogue and emits bf16 — must equal the f32
    kernel + caller rescale + bf16 cast bit-for-bit (same f32 op order)."""
    import jax.numpy as jnp

    q = _large_m_cases()["w8a8_percol"]
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((48, 256), dtype=np.float32) * 0.1)
    ref = np.asarray(
        quant_matmul_pallas(x, q).astype(jnp.bfloat16)
    )
    got = np.asarray(quant_matmul_pallas(x, q, out_dtype=jnp.bfloat16))
    assert got.dtype == np.dtype("<u2") or str(got.dtype) == "bfloat16"
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_large_m_w4a8_grouped_chunks_through_kernel():
    """Grouped w4a8 (the w4a8 serving default) at prefill M runs the
    grouped Pallas kernel over 256-row M-chunks (round-5: the bf16-dequant
    detour this replaces cost w4a8 2x on config-3 prefill).  Numerics must
    match the dequantized reference, including a ragged final chunk."""
    w, q = _mk_w4a8(k=512, n=256, group=128)
    rng = np.random.default_rng(11)
    m = 600  # chunks of 256, 256, 88 (ragged tail)
    x = jnp.asarray(rng.standard_normal((m, 512), dtype=np.float32) * 0.1)
    expected = np.asarray(
        jnp.dot(
            x.astype(jnp.bfloat16),
            dequantize(q, dtype=jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    got = np.asarray(quant_matmul_pallas(x, q))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=8e-2, rtol=8e-2)


# ----------------------------------------------------------------------
# w4a8 rank-1 scales (grouped serving default; round-5 prefill fix)
# ----------------------------------------------------------------------


def test_w4a8_rank1_scales_factorize():
    """Opt-in rank-1 for grouped planar w4a8: stored product scales must
    be an exact row (x) col outer product with row[0] == 1."""
    from caesar_tpu.engine.quant import _unplanarize_scales, rank1_factors

    _, q = _mk_w4a8(k=512, n=256, group=128, rank1=True)
    assert q.rank1
    s = np.asarray(_unplanarize_scales(q.scales), np.float32)
    row, col = np.asarray(rank1_factors(q)[0]), np.asarray(rank1_factors(q)[1])
    np.testing.assert_allclose(row[0], 1.0, rtol=1e-2)
    # reconstruction within bf16 storage rounding
    np.testing.assert_allclose(
        s, row[:, None] * col[None, :], rtol=2e-2
    )


def test_w4a8_rank1_covers_free_scales():
    """Rank-1 constrained scales never clip: they are >= the free grouped
    scales everywhere (col is the per-column cover)."""
    from caesar_tpu.engine.quant import _rank1_scales

    rng = np.random.default_rng(3)
    free = np.exp(rng.standard_normal((7, 64))).astype(np.float32)
    constrained = _rank1_scales(free)
    assert (constrained >= free * (1 - 1e-6)).all()


def test_w4a8_rank1_large_m_matches_dequant_reference():
    """The factorized large-M (prefill) path: one full-K int8 dot with the
    row factor folded into the activations — must match x @ dequant(w)
    within int8-activation quantization noise."""
    from caesar_tpu.ops.quant_matmul import _XLA_M

    w, q = _mk_w4a8(k=512, n=256, group=128, seed=1, rank1=True)
    assert q.rank1
    rng = np.random.default_rng(2)
    m = max(_XLA_M, 256)
    x = jnp.asarray(rng.standard_normal((m, 512)) * 0.2, jnp.bfloat16)
    got = np.asarray(quant_matmul_pallas(x, q), np.float32)
    want = np.asarray(
        jnp.dot(x, dequantize(q), preferred_element_type=jnp.float32),
        np.float32,
    )
    # error budget: per-token int8 activation quantization (~1%) on top of
    # the shared int4 weight error (cancelled by using dequant(q) as ref)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=0.05 * scale, rtol=0.2)


def test_w4a8_rank1_prefill_decode_consistency():
    """Large-M (factorized dot) and small-M (grouped kernel) paths agree
    within activation-quant noise for the same weights — the serving
    boundary documented at _XLA_M."""
    w, q = _mk_w4a8(k=512, n=256, group=128, seed=4, rank1=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 512)) * 0.2, jnp.bfloat16)
    small = np.asarray(quant_matmul_pallas(x, q), np.float32)
    big_x = jnp.concatenate([x] * 40, axis=0)  # 320 rows >= _XLA_M
    big = np.asarray(quant_matmul_pallas(big_x, q), np.float32)[:8]
    scale = np.abs(small).max()
    np.testing.assert_allclose(big, small, atol=0.05 * scale, rtol=0.2)


def test_fuse_params_skips_rank1_parts():
    """rank-1 parts must not concat along out (row factors differ)."""
    from caesar_tpu.engine.quant import fuse_params, quantize_params

    rng = np.random.default_rng(0)
    layer = {
        "ln_attn": jnp.ones((256,)), "ln_mlp": jnp.ones((256,)),
        "wq": rng.standard_normal((256, 256)).astype(np.float32),
        "wk": rng.standard_normal((256, 128)).astype(np.float32),
        "wv": rng.standard_normal((256, 128)).astype(np.float32),
        "wo": rng.standard_normal((256, 256)).astype(np.float32),
        "mlp": {
            "gate": rng.standard_normal((256, 512)).astype(np.float32),
            "up": rng.standard_normal((256, 512)).astype(np.float32),
            "down": rng.standard_normal((512, 256)).astype(np.float32),
        },
    }
    params = {"layers": [layer]}
    qp = quantize_params(params, bits=4, group=128, act="int8", rank1=True)
    fused = fuse_params(qp)
    new_layer = fused["layers"][0]
    assert "wq" in new_layer and "wqkv" not in new_layer
    assert "gate" in new_layer["mlp"] and "gate_up" not in new_layer["mlp"]
    # default (rank1 off) w4a8 still fuses
    qp_def = quantize_params(params, bits=4, group=128, act="int8")
    assert "wqkv" in fuse_params(qp_def)["layers"][0]
    # w8a8 (non-rank1) still fuses
    qp8 = quantize_params(params, bits=8, group=0, act="int8")
    fused8 = fuse_params(qp8)
    assert "wqkv" in fused8["layers"][0]


def test_weights_cache_roundtrips_rank1(tmp_path):
    from caesar_tpu.engine.weights import (
        _load_params_cache,
        _save_params_cache,
    )

    _, q = _mk_w4a8(k=512, n=256, group=128, rank1=True)
    params = {"layers": [{"wq": q}]}
    path = tmp_path / "cache.npz"
    _save_params_cache(path, params)
    loaded = _load_params_cache(path, jnp.bfloat16)
    lq = loaded["layers"][0]["wq"]
    assert lq.rank1 and lq.bits == 4 and lq.group == 128
    np.testing.assert_array_equal(
        np.asarray(lq.qweight), np.asarray(q.qweight)
    )
