"""Config-4 HBM/VMEM fit proof: 32B int4 + fp8-KV, tp=8, AOT (VERDICT r4 #5).

BASELINE config 4 (DeepSeek-R1-Distill-32B INT4 + FP8 KV, 8-chip sharded)
previously existed only as a tiny-spec dryrun on the virtual CPU mesh
(__graft_entry__.dryrun_multichip).  This probe compiles the REAL serving
programs — `step.make_sharded_prefill_chunk` and
`make_sharded_decode_steps` at the full `r1-distill-32b` shapes — against
a v5e:2x4 AOT topology (8 chips, no hardware needed) and records the
per-chip memory budget XLA itself reports:

  * argument bytes  — int4 weights + planar scales + fp8 KV pool + state,
    all sharded by the real TP plan (weights are never materialized: the
    param tree comes from jax.eval_shape over the engine's own
    init_params_device, so this runs in MBs of host RAM)
  * temp bytes      — XLA's scratch for the compiled program
  * total vs the v5e's 16 GiB HBM

Any VMEM/HBM overflow surfaces here as a compile error — the same class
of failure a real 8-chip bring-up would hit on step one.

    python tools/config4_probe.py [--out docs/CONFIG4_AOT_r5.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# keep this tool's own jax off the real TPU: AOT topology compiles are
# host-side, and a "probe" holding the serving chip's lease poisons
# measurements (docs/ENGINE.md, round-5 measurement notes)
os.environ.setdefault("JAX_PLATFORMS", "cpu,tpu")

_GIB = 1024**3


def _abstract_engine_state(spec, mesh, *, batch, max_seq, page_size,
                           n_pages, kv_quant, quant, quant_group):
    """Abstract (params, cache, decode state) trees on `mesh`, shaped
    exactly as Engine would build them, via eval_shape — no materialization."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from caesar_tpu.engine import step as step_mod
    from caesar_tpu.engine.kvcache import create_cache
    from caesar_tpu.engine.weights import (
        _set_act_mode,
        init_params_device,
        resolve_quant_group,
    )
    from caesar_tpu.parallel import plan as plan_mod

    bits = {"int4": 4, "w4a8": 4, "int8": 8, "w8a8": 8}[quant]
    act = "int8" if quant in ("w8a8", "w4a8") else "none"
    group = resolve_quant_group(quant, quant_group)

    a_params = jax.eval_shape(
        lambda: init_params_device(
            spec, seed=0, quant_bits=bits, quant_group=group,
            act=act if quant == "w4a8" else "none",
        )
    )
    if act != "none":
        a_params = _set_act_mode(a_params, act)
    a_cache = jax.eval_shape(
        lambda: create_cache(spec, n_pages, page_size, kv_quant)
    )
    a_params = plan_mod.shard_params(spec, a_params, mesh)
    a_cache = plan_mod.shard_cache(a_cache, mesh)

    repl = NamedSharding(mesh, P())

    def r(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=repl)

    w = max_seq // page_size
    state = step_mod.DecodeState(
        tokens=r((batch,), jnp.int32), positions=r((batch,), jnp.int32),
        page_tables=r((batch, w), jnp.int32), done=r((batch,), jnp.bool_),
        active=r((batch,), jnp.bool_), eos_floor=r((batch,), jnp.int32),
        stop_pos=r((batch,), jnp.int32),
        temperature=r((batch,), jnp.float32), top_k=r((batch,), jnp.int32),
        top_p=r((batch,), jnp.float32), rng=r((2,), jnp.uint32),
    )
    return a_params, a_cache, state, r, w


def _mem(compiled) -> dict:
    m = compiled.memory_analysis()
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(m, k, None)
        if v is not None:
            out[k.replace("_in_bytes", "_gib")] = round(v / _GIB, 3)
    return out


def main() -> None:
    out_path = "docs/CONFIG4_AOT_r5.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from caesar_tpu.engine import step as step_mod
    from caesar_tpu.engine.model import get_spec

    # config-4 shape (BASELINE.json): 32B, int4 weights, fp8 KV, tp=8,
    # 48-slot continuous batch, cross-turn prefix reuse at 4k context
    spec = get_spec("r1-distill-32b")
    batch = 48
    max_seq = 4096
    page_size = 64
    chunk = 512
    prefill_rows = 4
    # pool: every slot able to hold a full 4k context, plus scratch
    n_pages = batch * (max_seq // page_size) + 64

    topo = topologies.get_topology_desc(
        topology_name="v5e:2x4", platform="tpu"
    )
    mesh = Mesh(np.asarray(topo.devices).reshape(8), ("tp",))

    params, cache, state, r, w = _abstract_engine_state(
        spec, mesh, batch=batch, max_seq=max_seq, page_size=page_size,
        n_pages=n_pages, kv_quant="fp8", quant="int4", quant_group=-1,
    )

    # analytic per-chip argument budget (cross-check of XLA's number)
    def leaf_bytes(tree):
        def sharded(pspec):
            for entry in pspec:
                names = entry if isinstance(entry, tuple) else (entry,)
                if "tp" in names:
                    return 8
            return 1

        return sum(
            leaf.size * leaf.dtype.itemsize // sharded(leaf.sharding.spec)
            for leaf in jax.tree.leaves(tree)
        )

    report = {
        "model": spec.name,
        "quant": "int4",
        "kv_quant": "fp8",
        "tp": 8,
        "topology": "v5e:2x4",
        "batch": batch,
        "max_seq_len": max_seq,
        "n_pages": n_pages,
        "hbm_per_chip_gib": 16.0,
        "weights_per_chip_gib": round(leaf_bytes(params) / _GIB, 3),
        "kv_pool_per_chip_gib": round(leaf_bytes(cache) / _GIB, 3),
    }

    # ---- decode: the full n_steps scan over the 48-slot batch ----------
    decode_fn = step_mod.make_sharded_decode_steps(
        spec, mesh, params, cache, n_steps=32, use_kernel=True,
        microbatches=2,
    )
    lowered = decode_fn.lower(params, cache, state, r((), jnp.int32))
    report["decode"] = _mem(lowered.compile())

    # ---- prefill: packed 4-row x 512-token chunk dispatch --------------
    prefill_fn = step_mod.make_sharded_prefill_chunk(
        spec, mesh, params, cache, use_kernel=True, chunk=chunk
    )
    packed = r(
        (prefill_rows, chunk + chunk // page_size + 2 + w), jnp.int32
    )
    report["prefill"] = _mem(prefill_fn.lower(params, cache, packed).compile())

    for leg in ("decode", "prefill"):
        m = report[leg]
        m["resident_gib"] = round(
            report["weights_per_chip_gib"]
            + report["kv_pool_per_chip_gib"]
            + m.get("temp_size_gib", 0.0), 3
        )
        m["fits_16gib"] = m["resident_gib"] < 16.0

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
