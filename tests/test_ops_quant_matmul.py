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
