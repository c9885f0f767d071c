"""Per-op decode-step budget for the 7B serving config (VERDICT r1 item 2).

Builds DEVICE-SIDE fake weights with the exact shapes/dtypes of the serving
engine's quantized 7B params (values are irrelevant for timing; building on
device skips the 9 GB host cache load), then times:

  * the full decode_steps scan (the real serving dispatch), and
  * each component in isolation (differential in-jit loops, immune to the
    axon tunnel's per-dispatch noise — same method as kernel_probe.py),

printing a budget table whose sum should account for the step.

    python tools/step_probe.py [quant] [batch] [ctx]
    e.g. python tools/step_probe.py w8a8 32 384
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tools.kernel_probe import loop_time


def build_fake_params(spec, quant: str, key):
    """Device-resident params with serving shapes; no host materialization."""
    import jax
    import jax.numpy as jnp

    from caesar_tpu.engine.quant import QuantizedLinear

    act = "int8" if quant in ("w8a8", "w4a8") else "none"
    bits = {"int8": 8, "w8a8": 8, "int4": 4, "w4a8": 4}.get(quant)

    keys = iter(jax.random.split(key, 8 * spec.n_layers + 8))

    group_env = os.environ.get("PROBE_GROUP", "128")

    def ql(d_in, d_out):
        group = d_in if group_env == "full" else min(int(group_env), d_in)
        if quant == "w4a8":
            # column-planar biased packing (quant.quantize_weight): qweight
            # [in, out//2], planar scales [groups, 2, out//2]
            qw = jax.random.randint(
                next(keys), (d_in, d_out // 2), -127, 127, jnp.int8
            )
            scales = jnp.full(
                (d_in // group, 2, d_out // 2), 0.01, jnp.bfloat16
            )
        else:
            rows = d_in // 2 if bits == 4 else d_in
            qw = jax.random.randint(
                next(keys), (rows, d_out), -127, 127, jnp.int8
            )
            scales = jnp.full((d_in // group, d_out), 0.01, jnp.bfloat16)
        return QuantizedLinear(
            qweight=qw, scales=scales, bits=bits, group=group,
            out_features=d_out, in_features=d_in, act=act,
        )

    def mat(d_in, d_out):
        if bits is not None:
            return ql(d_in, d_out)
        return (
            jax.random.normal(next(keys), (d_in, d_out), jnp.bfloat16)
            / np.sqrt(d_in)
        )

    layers = []
    for _ in range(spec.n_layers):
        layers.append(
            {
                "ln_attn": jnp.ones((spec.dim,), jnp.bfloat16),
                "ln_mlp": jnp.ones((spec.dim,), jnp.bfloat16),
                "wqkv": mat(spec.dim, spec.q_dim + 2 * spec.kv_dim),
                "bqkv": jnp.zeros(
                    (spec.q_dim + 2 * spec.kv_dim,), jnp.bfloat16
                ),
                "wo": mat(spec.q_dim, spec.dim),
                "mlp": {
                    "gate_up": mat(spec.dim, 2 * spec.hidden),
                    "down": mat(spec.hidden, spec.dim),
                },
            }
        )
    params = {
        "embed": jax.random.normal(
            next(keys), (spec.vocab, spec.dim), jnp.bfloat16
        ) * 0.02,
        "layers": layers,
        "ln_out": jnp.ones((spec.dim,), jnp.bfloat16),
    }
    if not spec.tie_embeddings:
        params["unembed"] = (
            ql(spec.dim, spec.vocab)
            if bits is not None and spec.vocab % 256 == 0
            else jax.random.normal(
                next(keys), (spec.dim, spec.vocab), jnp.bfloat16
            ) / np.sqrt(spec.dim)
        )
    return params


def main() -> None:
    # probes compile the same graphs the engine does: reuse its
    # persistent compile cache so re-runs skip the minutes-long build
    from caesar_tpu.engine.engine import _enable_persistent_compile_cache
    _enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp

    from caesar_tpu.engine import kvcache, step as step_mod
    from caesar_tpu.engine.model import get_spec, linear, mlp, qkv_project
    from caesar_tpu.engine.sampling import sample_tokens
    from caesar_tpu.engine.step import DecodeState

    quant = sys.argv[1] if len(sys.argv) > 1 else "w8a8"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ctx = int(sys.argv[3]) if len(sys.argv) > 3 else 384
    kv_quant = os.environ.get("PROBE_KV", "bf16")
    page_size = 64
    max_seq = 2048
    n_steps = int(os.environ.get("PROBE_DECODE_STEPS", "32"))

    spec = get_spec(os.environ.get("PROBE_MODEL", "qwen2.5-coder-7b"))
    key = jax.random.PRNGKey(0)
    params = build_fake_params(spec, quant, key)
    n_pages = batch * (max_seq // page_size) // 2 + 64
    cache = kvcache.create_cache(spec, n_pages, page_size, kv_quant)

    used = -(-ctx // page_size)
    tables = np.zeros((batch, max_seq // page_size), np.int32)
    nxt = 1
    for b in range(batch):
        for j in range(used + n_steps // page_size + 1):
            tables[b, j] = nxt % n_pages
            nxt += 1
    state = DecodeState(
        tokens=jnp.full((batch,), 7, jnp.int32),
        positions=jnp.full((batch,), ctx - 1, jnp.int32),
        page_tables=jnp.asarray(tables),
        done=jnp.zeros((batch,), bool),
        active=jnp.ones((batch,), bool),
        eos_floor=jnp.zeros((batch,), jnp.int32),
        stop_pos=jnp.full((batch,), 2**30, jnp.int32),
        temperature=jnp.zeros((batch,), jnp.float32),
        top_k=jnp.zeros((batch,), jnp.int32),
        top_p=jnp.ones((batch,), jnp.float32),
        rng=jax.random.PRNGKey(1),
    )
    eos = jnp.asarray(2, jnp.int32)
    use_kernel = jax.default_backend() == "tpu"

    # ---- full step: time the REAL decode_steps dispatch --------------
    import time

    def run_decode(n):
        nonlocal cache, state
        c, s = cache, state
        t0 = time.perf_counter()
        for _ in range(n):
            c, s, out = step_mod.decode_steps(
                spec, params, c, n_steps, s, eos, use_kernel
            )
        np.asarray(out)  # sync
        dt = time.perf_counter() - t0
        cache, state = c, s
        return dt

    # tunnel health check: a trivial dot must come back fast.  A degraded
    # session (leaked lease / prior RESOURCE_EXHAUSTED) inflates every
    # number 5-20x — abort instead of printing garbage.
    import time as _time

    a = jnp.ones((256, 256), jnp.bfloat16)
    float(jnp.sum(jnp.dot(a, a)))  # warm
    _t0 = _time.perf_counter()
    float(jnp.sum(jnp.dot(a, a)))
    _dot_s = _time.perf_counter() - _t0
    if _dot_s > 1.0:
        raise SystemExit(
            f"TPU session degraded: trivial dot took {_dot_s:.2f}s "
            "(expect <0.1s warm). Wait for the lease to clear and retry."
        )

    run_decode(1)  # compile
    # tunnel stalls are additive and transient (multi-second, random):
    # min-filter each span over 3 repeats — a stalled small span otherwise
    # produces impossible (even negative) differentials
    t_big = min(run_decode(16) for _ in range(3))
    t_small = min(run_decode(2) for _ in range(3))
    step_ms = (t_big - t_small) / (14 * n_steps) * 1e3
    print(f"decode step total: {step_ms:8.3f} ms  "
          f"({batch / (step_ms / 1e3):,.0f} tok/s at B={batch})")
    if os.environ.get("PROBE_ONLY") == "step":
        return

    # ---- components (differential in-jit loops) ----------------------
    layer = params["layers"][0]
    x0 = jax.random.normal(key, (batch, 1, spec.dim), jnp.bfloat16)
    pos2d = state.positions[:, None]

    comps = {}

    def comp(name, make_step, x0, extras=(), per_layer=True):
        # NB: weights always travel via extras (jit ARGUMENTS) — closures
        # ship them as constants in the remote-compile request (HTTP 413)
        # PROBE_ITERS: sub-ms ops need >= ~600 iterations for the
        # differential to rise above the axon tunnel's +-10 ms dispatch
        # noise (round-5 finding: 200-iteration differentials reported
        # impossible >HBM rates)
        iters = int(os.environ.get("PROBE_ITERS", "200"))
        try:
            # min-of-3: tunnel stalls are additive + transient
            t_big = min(
                loop_time(make_step, x0, iters, extras) for _ in range(3)
            )
            t_small = min(
                loop_time(make_step, x0, iters // 10, extras)
                for _ in range(3)
            )
        except Exception as e:  # keep later comps alive (e.g. pool OOM)
            print(f"  [{name}: FAILED {type(e).__name__}]", flush=True)
            comps[name] = (float("nan"), per_layer)
            return
        ms = (t_big - t_small) / (iters - iters // 10) * 1e3
        comps[name] = (ms, per_layer)
        print(f"  [{name}: {ms:.4f} ms]", flush=True)

    def qkv_step(x, wqkv, bqkv):
        q, k, v = qkv_project(
            spec, {"wqkv": wqkv, "bqkv": bqkv}, x, pos2d
        )
        return x + q[..., 0, :1] * 0.0

    comp("qkv proj (+rope)", qkv_step, x0,
         extras=(layer["wqkv"], layer["bqkv"]))

    def o_step(x, wo):
        return x * 0.999 + linear(
            x.reshape(batch, 1, spec.q_dim), wo
        ) * 0.0

    comp("o proj", o_step, x0, extras=(layer["wo"],))

    def mlp_step(x, mlp_params):
        return x * 0.999 + mlp(mlp_params, x) * 0.0

    comp("mlp (gate_up+down)", mlp_step, x0, extras=(layer["mlp"],))

    if use_kernel:
        from caesar_tpu.ops.paged_attention import paged_attention_decode

        q0 = jax.random.normal(
            key, (batch, spec.n_heads, spec.head_dim), jnp.bfloat16
        )
        layer0 = jnp.asarray(0, jnp.int32)

        def attn_step(q, kp, vp):
            out = paged_attention_decode(
                q, kp, vp, state.page_tables, state.positions, layer0,
                page_size,
            )
            return q + out * 0.0

        comp("paged attention", attn_step, q0,
             extras=(cache.k_pages, cache.v_pages))

    kv1 = jax.random.normal(
        key, (batch, spec.n_kv_heads, spec.head_dim), jnp.bfloat16
    )
    wp = jnp.asarray(tables[:, used - 1])
    ws = jnp.full((batch,), 3, jnp.int32)

    def write_step(carry):
        # the pool travels in the LOOP CARRY so XLA updates it in place —
        # passing it as a loop-invariant extra would copy the full pool
        # every iteration (the round-2 probe measured that copy as a bogus
        # 3.2 ms/layer "scatter" cost)
        from caesar_tpu.engine.kvcache import PagedKVCache

        kp, vp, kv = carry
        c = PagedKVCache(k_pages=kp, v_pages=vp, page_size=page_size)
        c = kvcache.write_token(c, 0, wp, ws, kv, kv)
        # head-major pool: [L, pages, n_kv, page, hd] — take one [hd] row
        return (c.k_pages, c.v_pages,
                kv + c.k_pages[0, 0, 0, 0].astype(kv.dtype) * 0.0)

    comp("kv write (scatter)", write_step,
         (cache.k_pages, cache.v_pages, kv1))

    head_w = params.get("unembed", params["embed"].T)

    def head_step(x, hw):
        h = linear(x[:, 0], hw)
        return x + h[:, :1, None].astype(x.dtype) * 0.0

    comp("lm head", head_step, x0, extras=(head_w,), per_layer=False)

    logits0 = jax.random.normal(key, (batch, spec.vocab), jnp.float32)

    def sample_step(lg):
        t = sample_tokens(lg, state.rng, state.temperature, state.top_k,
                          state.top_p)
        return lg + t[:, None].astype(jnp.float32) * 0.0

    comp("sampling (greedy)", sample_step, logits0, per_layer=False)

    total = 0.0
    print(f"\nper-op budget (B={batch}, ctx={ctx}, quant={quant}, "
          f"kv={kv_quant}):")
    for name, (ms, per_layer) in comps.items():
        n = spec.n_layers if per_layer else 1
        tot = ms * n
        total += tot
        print(f"  {name:22s} {ms:8.4f} ms x{n:3d} = {tot:7.3f} ms")
    print(f"  {'SUM of components':22s} {'':8s}        = {total:7.3f} ms")
    print(f"  {'measured full step':22s} {'':8s}        = {step_ms:7.3f} ms"
          f"   (unattributed: {step_ms - total:+.3f} ms)")


if __name__ == "__main__":
    main()
