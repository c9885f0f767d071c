"""Parity tests for the fused gate_up+SiLU decode kernel (ops/mlp_fused.py).

Runs the Pallas kernel in interpreter mode on CPU against the unfused
reference path (quant dequant + XLA silu chain) — same int8 quantization,
so outputs must agree to f32-rounding-order tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from caesar_tpu.engine import quant
from caesar_tpu.ops import mlp_fused

K, H = 256, 384  # K % 128 == 0, H % 128 == 0 (bh=128 path)


def _mk(seed=0, fused=True):
    rng = np.random.default_rng(seed)
    wg = rng.standard_normal((K, H), np.float32) * 0.05
    wu = rng.standard_normal((K, H), np.float32) * 0.05
    qg = quant.quantize_weight(wg, bits=8, group=0, act="int8")
    qu = quant.quantize_weight(wu, bits=8, group=0, act="int8")
    if fused:
        gu = quant.QuantizedLinear(
            qweight=jnp.concatenate([qg.qweight, qu.qweight], axis=1),
            scales=jnp.concatenate([qg.scales, qu.scales], axis=1),
            bits=8, group=K, out_features=2 * H, in_features=K, act="int8",
        )
        params = {"gate_up": gu}
    else:
        params = {"gate": qg, "up": qu}
    x = rng.standard_normal((8, K), np.float32).astype(np.float32) * 0.5
    return params, jnp.asarray(x, jnp.bfloat16), (qg, qu)


def _reference_h(x, qg, qu):
    """The unfused path's math: per-token int8 activations, int32 dots,
    rescale, silu * up."""
    xq, xs = quant.quantize_activations(x.astype(jnp.bfloat16))
    g = (
        jnp.dot(xq.astype(jnp.int32), qg.qweight.astype(jnp.int32))
        .astype(jnp.float32)
        * qg.scales.astype(jnp.float32)
        * xs[:, None]
    )
    u = (
        jnp.dot(xq.astype(jnp.int32), qu.qweight.astype(jnp.int32))
        .astype(jnp.float32)
        * qu.scales.astype(jnp.float32)
        * xs[:, None]
    )
    return (jax.nn.silu(g) * u).astype(jnp.bfloat16)


@pytest.mark.parametrize("fused", [True, False])
def test_gateup_silu_matches_reference(fused):
    params, x, (qg, qu) = _mk(fused=fused)
    ok, why = mlp_fused.supports(params, x.shape[0])
    assert ok, why
    got = np.asarray(mlp_fused.gateup_silu(params, x), np.float32)
    want = np.asarray(_reference_h(x, qg, qu), np.float32)
    assert got.shape == want.shape == (8, H)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)


def test_supports_gates():
    params, x, _ = _mk()
    ok, _ = mlp_fused.supports(params, 8)
    assert ok
    # prefill-shaped M is rejected
    ok, why = mlp_fused.supports(params, 4096)
    assert not ok and "prefill" in why
    # grouped scales are rejected (per-column only)
    rng = np.random.default_rng(0)
    grouped = quant.quantize_weight(
        rng.standard_normal((K, 2 * H), np.float32), bits=8, group=128,
        act="int8",
    )
    ok, why = mlp_fused.supports({"gate_up": grouped}, 8)
    assert not ok


def test_mlp_routes_through_fused(monkeypatch):
    """model.mlp() uses the fused path when _use_pallas() says TPU."""
    from caesar_tpu.engine import model as model_mod

    params, x, (qg, qu) = _mk(fused=True)
    wd = np.random.default_rng(1).standard_normal((H, K), np.float32) * 0.05
    qd = quant.quantize_weight(wd, bits=8, group=0, act="int8")
    params = dict(params, down=qd)

    monkeypatch.setattr(quant, "_use_pallas", lambda: True)
    monkeypatch.setenv("CAESAR_FUSED_MLP", "1")  # the fused path is opt-in
    called = {}
    orig = mlp_fused.gateup_silu

    def spy(p, x2, tp_axis=None):
        called["yes"] = True
        return orig(p, x2, tp_axis)

    monkeypatch.setattr(mlp_fused, "gateup_silu", spy)
    out_fused = model_mod.mlp(params, x[None])  # [1, 8, K] leading dims
    assert called.get("yes"), "fused path not taken"

    monkeypatch.setattr(quant, "_use_pallas", lambda: False)
    out_ref = model_mod.mlp(params, x[None])
    np.testing.assert_allclose(
        np.asarray(out_fused, np.float32),
        np.asarray(out_ref, np.float32),
        rtol=5e-2, atol=5e-3,
    )
