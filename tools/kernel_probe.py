"""In-jit looped kernel timing: immune to the axon tunnel's per-dispatch
noise (tools/microbench.py dispatches op-by-op; through the tunnel that
floor is ~0.1-0.3 ms/dispatch, swamping sub-ms kernels).

Runs ITERS kernel invocations inside ONE lax.fori_loop under ONE jit, with a
data dependence chaining iterations so nothing is DCE'd, and ends in a
scalar fetch.  Reported ms = (loop_time - small_loop_time) / (ITERS - SMALL)
— differencing two iteration counts also cancels the dispatch+fetch cost.

    python tools/kernel_probe.py quant   # dequant matmul kernels
    python tools/kernel_probe.py attn    # paged attention decode kernel
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ITERS = int(os.environ.get("PROBE_ITERS", "200"))
SMALL = max(ITERS // 10, 2)


def _fetch(x):
    import jax
    import jax.numpy as jnp

    # tuple carries (e.g. a KV pool threaded through the loop so scatters
    # stay in-place): sync on the first leaf only
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(jnp.sum(leaf[..., :1].astype(jnp.float32)))


def loop_time(make_step, x0, iters, extras=(), _cache={}):
    """Time `iters` chained invocations of make_step inside one jit.

    The loop bound is TRACED (dynamic trip count), so differencing two
    iteration counts reuses one compiled program.  Large loop-invariant
    arrays must go in `extras` (passed as jit ARGUMENTS) — closing over them
    would ship them as constants in the compile request."""
    import jax
    import jax.numpy as jnp

    key = id(make_step)
    if key not in _cache:
        @jax.jit
        def run(x, n, *extras):
            def body(_, x):
                return make_step(x, *extras)

            return jax.lax.fori_loop(0, n, body, x, unroll=False)

        _cache[key] = run
    run = _cache[key]
    out = run(x0, jnp.asarray(iters, jnp.int32), *extras)
    _fetch(out)  # compile + warm
    t0 = time.perf_counter()
    _fetch(run(x0, jnp.asarray(iters, jnp.int32), *extras))
    return time.perf_counter() - t0


def probe(name, make_step, x0, bytes_per_iter, extras=()):
    # min-of-3 per span: the axon tunnel injects random multi-second
    # stalls that otherwise poison (even negate) the differential
    t_big = min(loop_time(make_step, x0, ITERS, extras) for _ in range(3))
    t_small = min(loop_time(make_step, x0, SMALL, extras) for _ in range(3))
    ms = (t_big - t_small) / (ITERS - SMALL) * 1e3
    gbps = bytes_per_iter / (ms / 1e3) / 1e9
    print(f"{name}: {ms:8.4f} ms  ({gbps:7.1f} GB/s)", flush=True)
    return ms


def probe_quant():
    import jax.numpy as jnp

    from caesar_tpu.engine.quant import quantize_weight
    from caesar_tpu.ops.quant_matmul import quant_matmul_pallas

    rng = np.random.default_rng(0)
    m = int(os.environ.get("PROBE_M", "32"))
    shapes = [
        ("qkv  3584x4608", 3584, 4608),
        ("down 18944x3584", 18944, 3584),
    ]
    if os.environ.get("PROBE_ALL_SHAPES"):
        shapes += [
            ("o    3584x3584", 3584, 3584),
            ("gate 3584x18944", 3584, 18944),
            ("gate_up 3584x37888", 3584, 37888),  # the fused serving shape
        ]
    for name, k, n in shapes:
        w = rng.standard_normal((k, n), np.float32) * 0.02
        x0 = jnp.asarray(
            rng.standard_normal((m, k), np.float32) * 0.1, jnp.bfloat16
        )
        which = os.environ.get("PROBE_KERNELS", "int8,w8a8,int4").split(",")
        for bits, act, grp, label in (
            (8, "none", 128, "int8  "),
            (8, "int8", 128, "w8a8  "),
            (8, "int8", 0, "w8a8pc"),  # per-column scales: serving default
            (4, "none", 128, "int4  "),
            (4, "int8", 128, "w4a8  "),  # planar biased packing
        ):
            if label.strip() not in which:
                continue
            q = quantize_weight(w, bits=bits, group=grp, act=act)

            def step(x, q=q, k=k):
                out = quant_matmul_pallas(x, q)
                # chain: fold output back into x's shape (cheap, keeps dep)
                return (x + out[:, :1].astype(jnp.bfloat16) * 0.0)

            qbytes = q.qweight.size + q.scales.size * 2
            probe(f"pallas {label} M={m} {name}", step, x0, qbytes)
        if "bf16" not in which:
            continue
        wq = jnp.asarray(w, jnp.bfloat16)

        def step_bf16(x, wq=wq):
            out = jnp.dot(x, wq, preferred_element_type=jnp.float32)
            return x + out[:, :1].astype(jnp.bfloat16) * 0.0

        probe(f"bf16 dense M={m} {name}", step_bf16, x0, k * n * 2)


def probe_attn():
    import jax
    import jax.numpy as jnp

    from caesar_tpu.ops.paged_attention import paged_attention_decode

    rng = np.random.default_rng(0)
    B = int(os.environ.get("PROBE_B", "32"))
    NKV, G, HD = 4, 7, 128
    PAGE = int(os.environ.get("PROBE_PAGE", "64"))
    MAXP = 2048 // PAGE
    n_pages = int(os.environ.get("PROBE_PAGES", str(4096 * 64 // PAGE)))
    ctx = int(os.environ.get("PROBE_CTX", "384"))
    n_layers = int(os.environ.get("PROBE_LAYERS", "1"))  # pool layer count

    kv_dtype = {
        "bf16": jnp.bfloat16, "fp8": jnp.float8_e4m3fn, "f32": jnp.float32,
    }[os.environ.get("PROBE_KV", "bf16")]
    k_pages = jnp.asarray(
        rng.standard_normal((n_layers, n_pages, NKV, PAGE, HD), np.float32),
        kv_dtype,
    )
    v_pages = jnp.asarray(
        rng.standard_normal((n_layers, n_pages, NKV, PAGE, HD), np.float32),
        kv_dtype,
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
    layer0 = jnp.asarray(0, jnp.int32)
    q0 = jnp.asarray(
        rng.standard_normal((B, NKV * G, HD), np.float32), jnp.bfloat16
    )

    def step(q, k_pages, v_pages):
        out = paged_attention_decode(
            q, k_pages, v_pages, tables, positions, layer0, PAGE
        )
        return q + out * 0.0

    live = B * used * PAGE * NKV * HD * 2 * 2
    probe(f"paged attn B={B} ctx={ctx}", step, q0, live,
          extras=(k_pages, v_pages))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("quant", "all"):
        probe_quant()
    if which in ("attn", "all"):
        probe_attn()


if __name__ == "__main__":
    main()
