"""Per-op microbenchmarks on the current backend (run on TPU).

Times the serving engine's hot ops in isolation so kernel tuning has a
fast feedback loop:

    python tools/microbench.py quant      # dequant-matmul kernel vs XLA
    python tools/microbench.py attn       # paged attention kernel vs XLA
    python tools/microbench.py step       # one full decode step, 7B int8
    python tools/microbench.py all

Each op is dispatched ITERS times back-to-back and synchronized by fetching
a scalar reduction of the final output — on the tunneled axon backend
`jax.block_until_ready` does NOT wait for execution (only a literal data
fetch does), so every timing here ends in a 4-byte device->host read, and
the measured tunnel round-trip overhead is subtracted.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = 50
_OVERHEAD_MS = None


def _sync(out):
    """Force completion: fetch a scalar derived from the output."""
    import jax.numpy as jnp

    leaf = out[0] if isinstance(out, (tuple, list)) else out
    return float(jnp.sum(leaf.astype(jnp.float32)))


def _overhead_ms():
    """Measured dispatch+fetch round-trip of a trivial op (subtracted)."""
    global _OVERHEAD_MS
    if _OVERHEAD_MS is None:
        import jax.numpy as jnp

        x = jnp.zeros((8, 128))
        _sync(x + 1)
        t0 = time.perf_counter()
        for _ in range(3):
            _sync(x + 1)
        _OVERHEAD_MS = (time.perf_counter() - t0) / 3 * 1e3
    return _OVERHEAD_MS


def timed(fn, *args, iters=ITERS):
    out = fn(*args)
    _sync(out)  # compile + warmup + drain queue
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    total_ms = (time.perf_counter() - t0) * 1e3 - _overhead_ms()
    return max(total_ms, 1e-6) / iters


def bench_quant():
    import jax
    import jax.numpy as jnp

    from caesar_tpu.engine.quant import dequantize, quantize_weight
    from caesar_tpu.ops.quant_matmul import quant_matmul_pallas

    rng = np.random.default_rng(0)
    # the 7B decode shapes (M=32 batch)
    shapes = [
        ("qkv  3584x4608", 3584, 4608),
        ("o    3584x3584", 3584, 3584),
        ("gate 3584x18944", 3584, 18944),
        ("down 18944x3584", 18944, 3584),
    ]
    for m in (32,):
        for name, k, n in shapes:
            w = rng.standard_normal((k, n), np.float32).astype(np.float32) * 0.02
            x = jnp.asarray(
                rng.standard_normal((m, k), np.float32) * 0.1, jnp.bfloat16
            )
            for bits, act in ((8, "none"), (8, "int8"), (4, "none")):
                q = quantize_weight(w, bits=bits, group=128, act=act)
                ms = timed(lambda a: quant_matmul_pallas(a, q), x)
                gb = (q.qweight.size + m * k * 2 + m * n * 4) / 1e9
                label = "w8a8     " if act == "int8" else f"int{bits}     "
                print(
                    f"pallas {label} M={m} {name}: {ms:8.3f} ms "
                    f"({gb / (ms / 1e3):6.1f} GB/s)"
                )
            wq = jnp.asarray(w, jnp.bfloat16)
            dot = jax.jit(
                lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
            )
            ms = timed(dot, x, wq)
            gb = (k * n * 2 + m * k * 2 + m * n * 4) / 1e9
            print(f"bf16 dense  M={m} {name}: {ms:8.3f} ms ({gb / (ms / 1e3):6.1f} GB/s)")
            q8 = quantize_weight(w, bits=8, group=128)
            xla8 = jax.jit(
                lambda a, qq=q8: jnp.dot(
                    a, dequantize(qq, jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            )
            ms = timed(xla8, x)
            print(f"xla dequant8 M={m} {name}: {ms:8.3f} ms")


def bench_attn():
    import jax
    import jax.numpy as jnp

    from caesar_tpu.engine.kvcache import PagedKVCache
    from caesar_tpu.engine.model import ModelSpec
    from caesar_tpu.engine.step import _paged_attention
    from caesar_tpu.ops.paged_attention import paged_attention_decode

    rng = np.random.default_rng(0)
    # 7B attention shape: 28 q heads, 4 kv heads, hd 128
    B, NKV, G, HD, PAGE = 32, 4, 7, 128, 64
    MAXP = 2048 // PAGE
    n_pages = 4096
    ctx = 384  # tokens of live context per sequence

    k_pages = jnp.asarray(
        rng.standard_normal((n_pages, NKV, PAGE, HD), np.float32), jnp.bfloat16
    )
    v_pages = jnp.asarray(
        rng.standard_normal((n_pages, NKV, PAGE, HD), np.float32), jnp.bfloat16
    )
    tables = np.zeros((B, MAXP), np.int32)
    nextp = 1
    used = -(-ctx // PAGE)
    for b in range(B):
        for j in range(used):
            tables[b, j] = nextp % n_pages
            nextp += 1
    tables = jnp.asarray(tables)
    positions = jnp.full((B,), ctx - 1, jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, NKV * G, HD), np.float32), jnp.bfloat16)

    layer0 = jnp.asarray(0)
    ms = timed(
        lambda qq: paged_attention_decode(
            qq, k_pages[None], v_pages[None], tables, positions, layer0, PAGE
        ),
        q,
    )
    live_gb = B * used * PAGE * NKV * HD * 2 * 2 / 1e9
    print(
        f"pallas paged attn B={B} ctx={ctx}: {ms:8.3f} ms/layer "
        f"({live_gb / (ms / 1e3):6.1f} GB/s live KV)"
    )

    spec = ModelSpec("t", 1, 1, 1, NKV * G, NKV, HD, 1)
    view = PagedKVCache(k_pages=k_pages[None], v_pages=v_pages[None], page_size=PAGE)
    xla = jax.jit(
        lambda qq: _paged_attention(
            spec, view, 0, qq[:, None], tables, positions[:, None]
        )
    )
    ms = timed(xla, q)
    full_gb = B * MAXP * PAGE * NKV * HD * 2 * 2 / 1e9
    print(
        f"xla gather attn B={B} ctx={ctx}: {ms:8.3f} ms/layer "
        f"(touches {full_gb:.2f} GB static)"
    )


def bench_step():
    import jax
    import jax.numpy as jnp

    from caesar_tpu.config import EngineConfig
    from caesar_tpu.engine import kvcache, step as step_mod
    from caesar_tpu.engine.step import DecodeState
    from caesar_tpu.engine.weights import load_model

    quant = os.environ.get("CAESAR_STEP_QUANT", "int8")
    spec, params = load_model("qwen2.5-coder-7b", quant=quant)
    from caesar_tpu.engine.quant import fuse_params

    params = fuse_params(params)
    B, PAGE, MAXP = 32, 64, 32
    pool_sizes = [int(x) for x in os.environ.get(
        "CAESAR_STEP_POOLS", "512,1536"
    ).split(",")]
    tables = np.zeros((B, MAXP), np.int32)
    nextp = 1
    for b in range(B):
        for j in range(6):
            tables[b, j] = nextp
            nextp += 1
    state = DecodeState(
        tokens=jnp.zeros(B, jnp.int32),
        positions=jnp.full((B,), 383, jnp.int32),
        page_tables=jnp.asarray(tables),
        done=jnp.zeros(B, bool),
        active=jnp.ones(B, bool),
        eos_floor=jnp.zeros(B, jnp.int32),
        stop_pos=jnp.full((B,), 2**30, jnp.int32),
        temperature=jnp.zeros(B, jnp.float32),
        top_k=jnp.zeros(B, jnp.int32),
        top_p=jnp.ones(B, jnp.float32),
        rng=jax.random.PRNGKey(0),
    )
    kernel_opts = [
        x == "true"
        for x in os.environ.get("CAESAR_STEP_KERNELS", "true,false").split(",")
    ]
    for pool in pool_sizes:
        for use_kernel in kernel_opts:
            c = kvcache.create_cache(spec, pool, PAGE, "bf16")  # fresh
            s = state
            t0 = time.perf_counter()
            c, s, out = step_mod.decode_steps(
                spec, params, c, 16, s, jnp.asarray(257, jnp.int32), use_kernel
            )
            _sync(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            iters = 8
            for _ in range(iters):
                c, s, out = step_mod.decode_steps(
                    spec, params, c, 16, s, jnp.asarray(257, jnp.int32),
                    use_kernel,
                )
            _sync(out)
            ms = ((time.perf_counter() - t0) * 1e3 - _overhead_ms()) / (
                iters * 16
            )
            print(
                f"7B {quant} decode step (pool={pool}, paged_kernel="
                f"{use_kernel}): {ms:8.3f} ms/step -> {B / (ms / 1e3):7.1f} "
                f"tok/s  (compile+warmup {compile_s:.0f}s)",
                flush=True,
            )
            del c


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("quant", "all"):
        bench_quant()
    if which in ("attn", "all"):
        bench_attn()
    if which in ("step", "all"):
        bench_step()


if __name__ == "__main__":
    main()
