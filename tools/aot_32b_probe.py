"""Config-4 fit proof: AOT-compile the 32B INT4 + FP8-KV tp=8 serving
steps against a v5e:2x4 topology and record per-chip HBM (round-5 VERDICT
item 5).

BASELINE config 4 is DeepSeek-R1-Distill-32B, INT4 weights, FP8 KV pages,
8-chip tensor sharding.  No 8-chip hardware exists in this environment, so
the proof is the compiler's: the SAME make_sharded_{prefill,decode} programs
the engine dispatches are AOT-compiled for the real v5e target (TPU PJRT
topology, no chips needed — the overlap probe's machinery), and XLA's
per-device memory analysis gives the exact argument/temp/output footprint
each chip would need.  Params/cache are pure ShapeDtypeStructs with
NamedShardings — 32B never materializes anywhere.

    python tools/aot_32b_probe.py [model] [max_batch] [max_seq]

Prints one JSON line; commit to docs/AOT_32B_r5.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def abstract_params(spec, mesh, quant_bits=4, group=128):
    """INT4 params tree as ShapeDtypeStructs with the TP plan's shardings
    (mirrors weights.init_params shapes + parallel.plan.shard_params)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from caesar_tpu.engine.quant import QuantizedLinear

    def leaf(shape, dtype, pspec):
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, pspec)
        )

    def ql(d_in, d_out, column):
        # int4 weight-only: qweight [in//2, out] nibble-packed, scales
        # [in/group, out]; column-parallel shards out, row-parallel in
        qspec = P(None, "tp") if column else P("tp", None)
        sspec = P(None, "tp") if column else P("tp", None)
        g = group
        return QuantizedLinear(
            qweight=leaf((d_in // 2, d_out), jnp.int8, qspec),
            scales=leaf((d_in // g, d_out), jnp.bfloat16, sspec),
            bits=4, group=g, out_features=d_out, in_features=d_in,
        )

    def vec(d):
        return leaf((d,), jnp.bfloat16, P(None))

    layers = []
    for _ in range(spec.n_layers):
        layer = {
            "ln_attn": vec(spec.dim),
            "ln_mlp": vec(spec.dim),
            "wq": ql(spec.dim, spec.q_dim, True),
            "wk": ql(spec.dim, spec.kv_dim, True),
            "wv": ql(spec.dim, spec.kv_dim, True),
            "wo": ql(spec.q_dim, spec.dim, False),
            "mlp": {
                "gate": ql(spec.dim, spec.hidden, True),
                "up": ql(spec.dim, spec.hidden, True),
                "down": ql(spec.hidden, spec.dim, False),
            },
        }
        if spec.attn_bias:
            layer["bq"] = leaf((spec.q_dim,), jnp.bfloat16, P("tp"))
            layer["bk"] = leaf((spec.kv_dim,), jnp.bfloat16, P("tp"))
            layer["bv"] = leaf((spec.kv_dim,), jnp.bfloat16, P("tp"))
        layers.append(layer)
    params = {
        "embed": leaf((spec.vocab, spec.dim), jnp.bfloat16, P(None, None)),
        "layers": layers,
        "ln_out": vec(spec.dim),
    }
    if not spec.tie_embeddings:
        params["unembed"] = ql(spec.dim, spec.vocab, True)
    return params


def abstract_cache(spec, mesh, n_pages, page_size):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from caesar_tpu.engine.kvcache import PagedKVCache

    shape = (spec.n_layers, n_pages, spec.n_kv_heads, page_size,
             spec.head_dim)
    pspec = P(None, None, "tp", None, None)

    def leaf():
        return jax.ShapeDtypeStruct(
            shape, jnp.float8_e4m3fn,
            sharding=NamedSharding(mesh, pspec),
        )

    return PagedKVCache(k_pages=leaf(), v_pages=leaf(), page_size=page_size)


def mem_report(compiled) -> dict:
    ma = compiled.memory_analysis()
    fields = (
        "argument_size_in_bytes", "output_size_in_bytes",
        "temp_size_in_bytes", "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    )
    out = {}
    for f in fields:
        v = getattr(ma, f, None)
        if v is not None:
            out[f.replace("_in_bytes", "_gib")] = round(v / 2 ** 30, 3)
    return out


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "r1-distill-32b"
    max_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    max_seq = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    page_size = 64
    prefill_chunk = 512
    prefill_rows = 4
    tp = 8

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from caesar_tpu.engine import step as step_mod
    from caesar_tpu.engine.model import get_spec

    topo = topologies.get_topology_desc(
        topology_name="v5e:2x4", platform="tpu"
    )
    mesh = Mesh(np.asarray(topo.devices).reshape(tp), ("tp",))
    spec = get_spec(model)

    n_pages = max_batch * max_seq // page_size
    a_params = abstract_params(spec, mesh)
    a_cache = abstract_cache(spec, mesh, n_pages, page_size)

    repl = NamedSharding(mesh, P())

    def r(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=repl)

    max_pages = max_seq // page_size

    out = {
        "metric": f"aot_fit_{model}_int4_fp8kv_tp{tp}_v5e",
        "config": {
            "model": model, "quant": "int4", "kv_quant": "fp8",
            "tp": tp, "max_batch": max_batch, "max_seq_len": max_seq,
            "n_pages": n_pages, "page_size": page_size,
            "prefill_chunk": prefill_chunk, "prefill_rows": prefill_rows,
        },
        "hbm_per_chip_gib": 16.0,
    }

    # ---- decode: the full n_steps scan -------------------------------
    state = step_mod.DecodeState(
        tokens=r((max_batch,), jnp.int32),
        positions=r((max_batch,), jnp.int32),
        page_tables=r((max_batch, max_pages), jnp.int32),
        done=r((max_batch,), jnp.bool_),
        active=r((max_batch,), jnp.bool_),
        eos_floor=r((max_batch,), jnp.int32),
        stop_pos=r((max_batch,), jnp.int32),
        temperature=r((max_batch,), jnp.float32),
        top_k=r((max_batch,), jnp.int32),
        top_p=r((max_batch,), jnp.float32),
        rng=r((2,), jnp.uint32),
    )
    decode_fn = step_mod.make_sharded_decode_steps(
        spec, mesh, a_params, a_cache, n_steps=32, use_kernel=True,
        microbatches=2,
    )
    compiled = decode_fn.lower(
        a_params, a_cache, state, r((), jnp.int32)
    ).compile()
    out["decode"] = mem_report(compiled)

    # ---- prefill: the packed batched-chunk dispatch ------------------
    prefill_fn = step_mod.make_sharded_prefill_chunk(
        spec, mesh, a_params, a_cache, use_kernel=True, chunk=prefill_chunk,
    )
    packed_w = prefill_chunk + prefill_chunk // page_size + 2 + max_pages
    packed = r((prefill_rows, packed_w), jnp.int32)
    compiled_p = prefill_fn.lower(a_params, a_cache, packed).compile()
    out["prefill"] = mem_report(compiled_p)

    for leg in ("decode", "prefill"):
        m = out[leg]
        total = (
            m.get("argument_size_gib", 0)
            + m.get("temp_size_gib", 0)
            + max(
                m.get("output_size_gib", 0) - m.get("alias_size_gib", 0), 0
            )
        )
        m["peak_estimate_gib"] = round(total, 3)
        m["fits_16gib"] = bool(total < 16.0)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
