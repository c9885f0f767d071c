"""Prefill flash-attention kernel (interpret mode) vs the XLA score path.

The kernel computes its dots in bf16 (prefill is MXU-compute-bound; see
ops/prefill_attention.py) while the XLA reference runs f32 scores, so
tolerances are bf16-scale.
"""

import numpy as np

import jax
import jax.numpy as jnp

from caesar_tpu.engine.kvcache import PagedKVCache
from caesar_tpu.engine.model import ModelSpec
from caesar_tpu.engine.step import _paged_attention
from caesar_tpu.ops.prefill_attention import prefill_attention, supports

PAGE = 16
N_PAGES = 64
N_KV = 2
GROUP = 4
HD = 32
T = 32  # chunk length


def build_case(starts=(0, 32, 96), seed=0):
    """Rows mid-prefill: row i's chunk begins at absolute position
    starts[i] (page-aligned, as the engine guarantees), with the prefix
    AND the chunk itself already written to the pool."""
    rng = np.random.default_rng(seed)
    b = len(starts)
    k_pages = rng.standard_normal((N_PAGES, N_KV, PAGE, HD)).astype(
        np.float32
    )
    v_pages = rng.standard_normal((N_PAGES, N_KV, PAGE, HD)).astype(
        np.float32
    )
    max_pages = max(-(-(s + T) // PAGE) for s in starts)
    tables = np.zeros((b, max_pages), np.int32)
    nxt = 1
    for i, s in enumerate(starts):
        for j in range(-(-(s + T) // PAGE)):
            tables[i, j] = nxt % N_PAGES
            nxt += 1
    q = rng.standard_normal((b, T, N_KV * GROUP, HD)).astype(np.float32)
    cache = PagedKVCache(
        k_pages=jnp.asarray(k_pages)[None],
        v_pages=jnp.asarray(v_pages)[None],
        page_size=PAGE,
    )
    return (
        cache,
        jnp.asarray(q),
        jnp.asarray(tables),
        jnp.asarray(np.asarray(starts, np.int32)),
    )


def xla_reference(cache, q, tables, starts):
    spec = ModelSpec(
        "t", vocab=1, dim=1, n_layers=1, n_heads=N_KV * GROUP,
        n_kv_heads=N_KV, head_dim=HD, hidden=1,
    )
    positions = starts[:, None] + jnp.arange(T)[None, :]
    out = _paged_attention(spec, cache, 0, q, tables, positions)
    return np.asarray(out, dtype=np.float32)


def run_kernel(cache, q, tables, starts):
    return np.asarray(
        prefill_attention(
            q, cache.k_pages, cache.v_pages, tables, starts,
            jnp.asarray(0), PAGE, interpret=True,
        ),
        dtype=np.float32,
    )


def test_prefill_kernel_matches_xla_path():
    cache, q, tables, starts = build_case()
    expected = xla_reference(cache, q, tables, starts)
    got = run_kernel(cache, q, tables, starts)
    np.testing.assert_allclose(got, expected, atol=3e-2, rtol=3e-2)


def test_prefill_kernel_fresh_sequences():
    """start=0 rows: pure self-attention over the chunk (config-3's first
    window), exercising the single-superblock path."""
    cache, q, tables, starts = build_case(starts=(0, 0, 0))
    expected = xla_reference(cache, q, tables, starts)
    got = run_kernel(cache, q, tables, starts)
    np.testing.assert_allclose(got, expected, atol=3e-2, rtol=3e-2)


def test_prefill_kernel_deep_prefix():
    """A start deep enough that the KV walk spans several superblocks and
    the last superblock is PARTIALLY past the row's length (tail page
    clamp + causal mask)."""
    cache, q, tables, starts = build_case(starts=(144, 48, 0))
    expected = xla_reference(cache, q, tables, starts)
    got = run_kernel(cache, q, tables, starts)
    np.testing.assert_allclose(got, expected, atol=3e-2, rtol=3e-2)


def test_prefill_kernel_fp8_pages():
    """FP8 pools (BASELINE config 4): bit-op upcast inside the kernel."""
    cache, q, tables, starts = build_case()
    cache = PagedKVCache(
        k_pages=cache.k_pages.astype(jnp.float8_e4m3fn),
        v_pages=cache.v_pages.astype(jnp.float8_e4m3fn),
        page_size=PAGE,
    )
    expected = xla_reference(cache, q, tables, starts)
    got = run_kernel(cache, q, tables, starts)
    np.testing.assert_allclose(got, expected, atol=6e-2, rtol=6e-2)


def test_prefill_kernel_sharded_tp2():
    """Under shard_map each shard attends over its own kv heads (the
    Megatron head-parallel plan) with zero cross-chip traffic."""
    from jax.sharding import Mesh, PartitionSpec as P

    cache, q, tables, starts = build_case()
    expected = xla_reference(cache, q, tables, starts)
    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("tp",))

    def inner(q, k_pages, v_pages, tables, starts):
        return prefill_attention(
            q, k_pages, v_pages, tables, starts, jnp.asarray(0), PAGE,
            interpret=True,
        )

    fn = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(None, None, "tp", None),  # q heads kv-major: per-kv split
            P(None, None, "tp", None, None),
            P(None, None, "tp", None, None),
            P(),
            P(),
        ),
        out_specs=P(None, None, "tp", None),
        check_vma=False,
    )
    got = np.asarray(
        fn(q, cache.k_pages, cache.v_pages, tables, starts),
        dtype=np.float32,
    )
    np.testing.assert_allclose(got, expected, atol=3e-2, rtol=3e-2)


def test_supports_geometry():
    spec = ModelSpec(
        "t", vocab=1, dim=1, n_layers=1, n_heads=8, n_kv_heads=2,
        head_dim=128, hidden=1,
    )
    assert supports(spec, 64, 512)
    assert supports(spec, 64, 1536)
    assert not supports(spec, 48, 512)  # pages don't tile superblocks
    bad_hd = ModelSpec(
        "t", vocab=1, dim=1, n_layers=1, n_heads=8, n_kv_heads=2,
        head_dim=64, hidden=1,
    )
    assert not supports(bad_hd, 64, 512)


# ----------------------------------------------------------------------
# Pallas page writer (ops/kv_writer.py)
# ----------------------------------------------------------------------


def test_kv_writer_matches_xla_scatter():
    """The DMA page writer must produce a pool bit-identical to the XLA
    write_chunk_batch scatter (disjoint real pages + shared scratch 0)."""
    from caesar_tpu.engine import kvcache

    rng = np.random.default_rng(3)
    p, t = 3, 32  # 2 pages per row at PAGE=16
    k = jnp.asarray(rng.standard_normal((p, t, N_KV, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((p, t, N_KV, HD)), jnp.float32)
    page_ids = jnp.asarray([[3, 7], [12, 5], [0, 0]], jnp.int32)  # row 3 pads
    pool = jnp.asarray(
        rng.standard_normal((1, N_PAGES, N_KV, PAGE, HD)), jnp.float32
    )
    cache0 = kvcache.PagedKVCache(k_pages=pool, v_pages=pool, page_size=PAGE)

    ref = kvcache.write_chunk_batch(cache0, 0, page_ids, k, v)
    got = kvcache.write_chunk_batch_kernel(
        cache0, 0, page_ids, k, v, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(got.k_pages), np.asarray(ref.k_pages)
    )
    np.testing.assert_array_equal(
        np.asarray(got.v_pages), np.asarray(ref.v_pages)
    )


def test_kv_writer_fp8_pool():
    from caesar_tpu.engine import kvcache

    rng = np.random.default_rng(4)
    p, t = 2, 16
    k = jnp.asarray(rng.standard_normal((p, t, N_KV, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((p, t, N_KV, HD)), jnp.float32)
    page_ids = jnp.asarray([[2], [9]], jnp.int32)
    pool = jnp.zeros((1, N_PAGES, N_KV, PAGE, HD), jnp.float8_e4m3fn)
    cache0 = kvcache.PagedKVCache(k_pages=pool, v_pages=pool, page_size=PAGE)
    ref = kvcache.write_chunk_batch(cache0, 0, page_ids, k, v)
    got = kvcache.write_chunk_batch_kernel(
        cache0, 0, page_ids, k, v, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(got.k_pages.astype(jnp.float32)),
        np.asarray(ref.k_pages.astype(jnp.float32)),
    )
