"""Paged-attention kernel (interpret mode) vs the XLA gather reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from caesar_tpu.engine import kvcache
from caesar_tpu.engine.kvcache import PagedKVCache
from caesar_tpu.ops.paged_attention import paged_attention_decode

PAGE = 16
N_PAGES = 32
N_KV = 2
GROUP = 4
HD = 32
B = 4


def build_case(seed=0, lengths=(37, 5, 60, 16), dtype="f32"):
    rng = np.random.default_rng(seed)
    max_pages = N_PAGES // B
    k_pages = rng.standard_normal((N_PAGES, N_KV, PAGE, HD)).astype(np.float32)
    v_pages = rng.standard_normal((N_PAGES, N_KV, PAGE, HD)).astype(np.float32)
    tables = np.zeros((B, max_pages), np.int32)
    # disjoint page assignments per sequence
    next_page = 1
    for b in range(B):
        used = -(-lengths[b] // PAGE)
        for j in range(used):
            tables[b, j] = next_page % N_PAGES
            next_page += 1
    q = rng.standard_normal((B, N_KV * GROUP, HD)).astype(np.float32)
    positions = np.asarray([l - 1 for l in lengths], np.int32)
    cache = PagedKVCache(
        k_pages=jnp.asarray(k_pages),
        v_pages=jnp.asarray(v_pages),
        page_size=PAGE,
    )
    return cache, jnp.asarray(q), jnp.asarray(tables), jnp.asarray(positions)


def xla_reference(cache, q, tables, positions):
    from caesar_tpu.engine.step import _paged_attention
    from caesar_tpu.engine.model import ModelSpec

    spec = ModelSpec(
        "t", vocab=1, dim=1, n_layers=1, n_heads=N_KV * GROUP, n_kv_heads=N_KV,
        head_dim=HD, hidden=1,
    )
    # layer index 0 over a single-layer view of the pools
    view = PagedKVCache(
        k_pages=cache.k_pages[None],
        v_pages=cache.v_pages[None],
        page_size=cache.page_size,
    )
    out = _paged_attention(spec, view, 0, q[:, None], tables, positions[:, None])
    return np.asarray(out[:, 0], dtype=np.float32)


def test_kernel_matches_gather_reference():
    cache, q, tables, positions = build_case()
    expected = xla_reference(cache, q, tables, positions)
    got = np.asarray(
        paged_attention_decode(
            q, cache.k_pages[None], cache.v_pages[None], tables, positions,
            jnp.asarray(0), PAGE, interpret=True,
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


def test_kernel_single_token_sequence():
    cache, q, tables, positions = build_case(lengths=(1, 1, 1, 1))
    expected = xla_reference(cache, q, tables, positions)
    got = np.asarray(
        paged_attention_decode(
            q, cache.k_pages[None], cache.v_pages[None], tables, positions,
            jnp.asarray(0), PAGE, interpret=True,
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


def test_kernel_page_boundary_lengths():
    cache, q, tables, positions = build_case(lengths=(16, 32, 48, 64))
    expected = xla_reference(cache, q, tables, positions)
    got = np.asarray(
        paged_attention_decode(
            q, cache.k_pages[None], cache.v_pages[None], tables, positions,
            jnp.asarray(0), PAGE, interpret=True,
        )
    )
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


def test_kernel_fp8_pages():
    """FP8 page storage (BASELINE config 4): the kernel upcasts fp8 tiles in
    VMEM; accuracy vs the XLA reference computed on the same fp8-rounded
    pages must be exact up to f32 accumulation order."""
    cache, q, tables, positions = build_case()
    cache = PagedKVCache(
        k_pages=cache.k_pages.astype(jnp.float8_e4m3fn),
        v_pages=cache.v_pages.astype(jnp.float8_e4m3fn),
        page_size=PAGE,
    )
    got = np.asarray(
        paged_attention_decode(
            q, cache.k_pages[None], cache.v_pages[None], tables, positions,
            jnp.asarray(0), PAGE, interpret=True,
        )
    )
    expected = xla_reference(cache, q, tables, positions)
    np.testing.assert_allclose(got, expected, atol=5e-2, rtol=5e-2)


def test_kernel_sharded_tp2_matches_reference():
    """The kernel under shard_map over a tp=2 mesh: each shard attends over
    its own kv head (head-parallel plan, no cross-chip traffic) and the
    stitched output matches the unsharded XLA reference."""
    from jax.sharding import Mesh, PartitionSpec as P

    cache, q, tables, positions = build_case()
    expected = xla_reference(cache, q, tables, positions)

    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("tp",))

    def inner(q, k_pages, v_pages, tables, positions):
        return paged_attention_decode(
            q, k_pages, v_pages, tables, positions,
            jnp.asarray(0), PAGE, interpret=True,
        )

    fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(None, "tp", None),  # q heads are kv-major: per-kv split
            P(None, None, "tp", None, None),  # head-major pool: n_kv = dim 2
            P(None, None, "tp", None, None),
            P(),
            P(),
        ),
        out_specs=P(None, "tp", None),
        check_vma=False,
    )
    got = np.asarray(
        fn(q, cache.k_pages[None], cache.v_pages[None], tables, positions)
    )
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=2e-5)


def test_kernel_skip_rows():
    """Skipped rows (done/inactive slots) clamp to a single token: the
    output equals attention over position 0 only, and non-skipped rows are
    bit-identical to a run without any skip mask."""
    cache, q, tables, positions = build_case()
    skip = jnp.asarray([0, 1, 0, 1], jnp.int32)
    got = np.asarray(
        paged_attention_decode(
            q, cache.k_pages[None], cache.v_pages[None], tables, positions,
            jnp.asarray(0), PAGE, skip=skip, interpret=True,
        )
    )
    full = np.asarray(
        paged_attention_decode(
            q, cache.k_pages[None], cache.v_pages[None], tables, positions,
            jnp.asarray(0), PAGE, interpret=True,
        )
    )
    # unskipped rows: identical to the unmasked run
    np.testing.assert_array_equal(got[0], full[0])
    np.testing.assert_array_equal(got[2], full[2])
    # skipped rows: attention over exactly the first token (softmax over a
    # single score is 1.0, so the output is that token's V row, broadcast
    # over the query heads)
    expected = np.asarray(
        paged_attention_decode(
            q, cache.k_pages[None], cache.v_pages[None], tables,
            jnp.zeros_like(positions), jnp.asarray(0), PAGE, interpret=True,
        )
    )
    np.testing.assert_allclose(got[1], expected[1], atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got[3], expected[3], atol=2e-5, rtol=2e-5)


def test_kernel_bf16_pages():
    cache, q, tables, positions = build_case()
    cache = PagedKVCache(
        k_pages=cache.k_pages.astype(jnp.bfloat16),
        v_pages=cache.v_pages.astype(jnp.bfloat16),
        page_size=PAGE,
    )
    got = np.asarray(
        paged_attention_decode(
            q, cache.k_pages[None], cache.v_pages[None], tables, positions,
            jnp.asarray(0), PAGE, interpret=True,
        )
    )
    # compare against reference computed on the bf16-rounded pages
    expected = xla_reference(cache, q, tables, positions)
    np.testing.assert_allclose(got, expected, atol=2e-2, rtol=2e-2)
