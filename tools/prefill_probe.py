"""Prefill-chunk budget probe (bench showed ~0.74 s per 256-token chunk on
TPU vs the ~20 ms weight-pass expectation — find where it goes).

Times the REAL `step.prefill_chunk` dispatch end-to-end (differential over
call counts, same method as step_probe), then the components in isolation:
the per-layer XLA paged-attention gather path, write_chunk scatter, and the
m=256 quant matmuls.

    python tools/prefill_probe.py [quant] [chunk] [window_pages]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tools.kernel_probe import loop_time
from tools.step_probe import build_fake_params


def main() -> None:
    # probes compile the same graphs the engine does: reuse its
    # persistent compile cache so re-runs skip the minutes-long build
    from caesar_tpu.engine.engine import _enable_persistent_compile_cache
    _enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp

    from caesar_tpu.engine import kvcache, step as step_mod
    from caesar_tpu.engine.model import get_spec, linear, mlp, qkv_project

    quant = sys.argv[1] if len(sys.argv) > 1 else "w8a8"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    page_size = 64
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    max_seq = 2048
    kv_quant = os.environ.get("PROBE_KV", "bf16")

    spec = get_spec(os.environ.get("PROBE_MODEL", "qwen2.5-coder-7b"))
    key = jax.random.PRNGKey(0)
    params = build_fake_params(spec, quant, key)
    # pool sized like the serving engine's auto_pages on a v5e (the copy
    # cost of a non-in-place scatter scales with POOL size, so probe the
    # real size)
    n_pages = int(os.environ.get("PROBE_PAGES", "0")) or (
        32 * (max_seq // page_size) // 2 + 64
    )
    cache = kvcache.create_cache(spec, n_pages, page_size, kv_quant)
    pool_gb = (
        cache.k_pages.size * cache.k_pages.dtype.itemsize * 2 / 2**30
    )
    print(f"pool: {n_pages} pages, {pool_gb:.2f} GB total")

    pbatch = int(os.environ.get("PROBE_PREFILL_BATCH", "1"))
    # PROBE_START: absolute position of the chunk's first token — start=0
    # measures a prompt's FIRST chunk (attention over `chunk` tokens only);
    # real config-3 dispatches average start ~700 (three chunks per 1.5k
    # prompt), so their attention streams the whole written prefix
    start = int(os.environ.get("PROBE_START", "0"))
    assert start % page_size == 0 and (start + chunk) <= window * page_size
    tokens = jnp.full((pbatch, chunk), 7, jnp.int32)
    positions = jnp.tile(
        start + jnp.arange(chunk, dtype=jnp.int32), (pbatch, 1)
    )
    table = jnp.tile(
        jnp.asarray(np.arange(1, window + 1, dtype=np.int32)), (pbatch, 1)
    )
    first_pg = start // page_size
    chunk_pages = jnp.tile(
        jnp.asarray(
            np.arange(
                first_pg + 1, first_pg + chunk // page_size + 1,
                dtype=np.int32,
            )
        ),
        (pbatch, 1),
    )
    last = jnp.full((pbatch,), chunk - 1, jnp.int32)

    # kernel path by default on TPU (the serving default since round 4);
    # PROBE_PREFILL_XLA=1 forces the score-materializing XLA path
    import jax as _jax

    use_kernel = (
        _jax.default_backend() == "tpu"
        and not os.environ.get("PROBE_PREFILL_XLA")
    )

    def run_prefill(n):
        nonlocal cache
        c = cache
        t0 = time.perf_counter()
        for _ in range(n):
            c, logits = step_mod.prefill_chunk(
                spec, params, c, tokens, positions, table, chunk_pages,
                last, use_kernel,
            )
        np.asarray(logits)  # sync
        dt = time.perf_counter() - t0
        cache = c
        return dt

    run_prefill(1)  # compile
    t8 = run_prefill(8)
    t2 = run_prefill(2)
    chunk_ms = (t8 - t2) / 6 * 1e3
    print(
        f"prefill chunk total: {chunk_ms:8.2f} ms  "
        f"({pbatch * chunk / (chunk_ms / 1e3):,.0f} tok/s"
        f" at prefill_batch={pbatch})"
    )

    # ---- components (single-row shapes) -------------------------------
    layer = params["layers"][0]
    x0 = jax.random.normal(key, (1, chunk, spec.dim), jnp.bfloat16)
    pos2d = positions[:1]  # [1, chunk]

    comps = {}

    def comp(name, make_step, x0, extras=(), per_layer=True, iters=200):
        t_big = loop_time(make_step, x0, iters, extras)
        t_small = loop_time(make_step, x0, iters // 10, extras)
        ms = (t_big - t_small) / (iters - iters // 10) * 1e3
        comps[name] = (ms, per_layer)

    def qkv_step(x, wqkv, bqkv):
        q, k, v = qkv_project(spec, {"wqkv": wqkv, "bqkv": bqkv}, x, pos2d)
        return x + q[..., :1, 0, :1] * 0.0

    comp("qkv proj (+rope)", qkv_step, x0,
         extras=(layer["wqkv"], layer["bqkv"]))

    def o_step(x, wo):
        return x * 0.999 + linear(x.reshape(1, chunk, spec.q_dim), wo) * 0.0

    comp("o proj", o_step, x0, extras=(layer["wo"],))

    def mlp_step(x, mlp_params):
        return x * 0.999 + mlp(mlp_params, x) * 0.0

    comp("mlp (gate_up+down)", mlp_step, x0, extras=(layer["mlp"],))

    # XLA paged-attention gather path at prefill shapes
    q0 = jax.random.normal(
        key, (1, chunk, spec.n_heads, spec.head_dim), jnp.bfloat16
    )

    def attn_step(q, kp, vp):
        c = kvcache.PagedKVCache(k_pages=kp, v_pages=vp, page_size=page_size)
        out = step_mod._paged_attention(
            spec, c, 0, q, table[:1], pos2d
        )
        return q + out[..., :1, :1, :1] * 0.0

    comp("prefill attention (XLA)", attn_step, q0,
         extras=(cache.k_pages, cache.v_pages), iters=100)

    if use_kernel:
        from caesar_tpu.ops.prefill_attention import prefill_attention

        qb = jax.random.normal(
            key, (pbatch, chunk, spec.n_heads, spec.head_dim), jnp.bfloat16
        )
        starts = positions[:, 0]
        layer0 = jnp.asarray(0, jnp.int32)

        def kattn_step(q, kp, vp):
            out = prefill_attention(
                q, kp, vp, table, starts, layer0, page_size
            )
            return q + out[..., :1, :1, :1] * 0.0

        comp(f"prefill attention (flash, P={pbatch})", kattn_step, qb,
             extras=(cache.k_pages, cache.v_pages), iters=100)

    # write_chunk scatter: pool travels in the carry for in-place updates
    kvc = jax.random.normal(
        key, (chunk, spec.n_kv_heads, spec.head_dim), jnp.bfloat16
    )

    def write_step(carry):
        kp, vp, kv = carry
        c = kvcache.PagedKVCache(k_pages=kp, v_pages=vp, page_size=page_size)
        c = kvcache.write_chunk(c, 0, chunk_pages[0], kv, kv)
        # head-major pool [L, pages, n_kv, page, hd]: take one [hd] row
        return (c.k_pages, c.v_pages,
                kv + c.k_pages[0, 0, 0, 0].astype(kv.dtype) * 0.0)

    comp("kv write_chunk", write_step,
         (cache.k_pages, cache.v_pages, kvc), iters=100)

    def head_step(x, hw):
        h = linear(x[0, -1:], hw)
        return x + h[:, :1, None].astype(x.dtype) * 0.0

    comp("lm head (last tok)", head_step, x0,
         extras=(params.get("unembed", params["embed"].T),),
         per_layer=False)

    total = 0.0
    print(f"\nper-op budget (chunk={chunk}, window={window}, quant={quant}):")
    for name, (ms, per_layer) in comps.items():
        n = spec.n_layers if per_layer else 1
        tot = ms * n
        total += tot
        print(f"  {name:26s} {ms:8.4f} ms x{n:3d} = {tot:8.3f} ms")
    print(f"  {'SUM of components':26s} {'':8s}        = {total:8.3f} ms")
    print(f"  {'measured full chunk':26s} {'':8s}        = {chunk_ms:8.3f} ms"
          f"   (unattributed: {chunk_ms - total:+.3f} ms)")


if __name__ == "__main__":
    main()
