"""Collective-overlap evidence for the microbatched TP decode (VERDICT r2 #7).

The claim (engine/step.py `_decode_one` docstring): with decode_microbatches
> 1 the batch slices are walked layer-major/slice-minor, so slice i's
row-parallel psums have no data dependency on slice i+1's matmuls and XLA
can run the all-reduce asynchronously behind the next slice's compute.
Token parity is tested (tests/test_engine.py); this probe produces the
*compiler-level* artifact that the overlap actually exists:

1. **TPU AOT** (needs the TPU PJRT plugin, no chips): compiles the real
   `make_sharded_decode_steps` program for a v5e:2x4 topology and scans the
   scheduled HLO for `all-reduce-start`/`all-reduce-done` pairs, reporting
   how many real ops (dot/fusion/custom-call) the scheduler placed INSIDE
   each async span — >0 means the collective rides under compute.
2. **CPU mesh** (works anywhere): compiles the same program on the virtual
   8-device mesh and counts tuple-shaped (combined) all-reduces.  XLA's
   all-reduce combiner may only merge collectives with no mutual data
   dependency, so any >=2-operand all-reduce is a proof two microbatch
   slices' psums are independent — the precondition for overlap.  With
   microbatches=1 every psum is sequentially dependent and the count is 0.

    python tools/overlap_probe.py [microbatches] [--cpu-only]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# the CPU-mesh leg needs >= 2 virtual CPU devices; set before jax imports
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import json

#: ops that count as "real work" scheduled inside an async collective span
_WORK = re.compile(r"= [a-z0-9_\[\]{},: ]*(fusion|dot|custom-call)\(")
#: linear-time tuple-all-reduce pattern ([^)]* cannot cross the paren —
#: the old nested-quantifier form backtracked catastrophically on long
#: HLO lines, the round-3 "46-minute compile")
_TUPLE_AR = re.compile(r"= \([^)]*,[^)]*\) all-reduce\(")


def _abstract_tp_args(spec, mesh, n_steps, batch, use_kernel, microbatches):
    """(decode_fn, abstract args) for AOT lowering over `mesh` (which may be
    a topology mesh with no addressable devices — leaves are
    ShapeDtypeStructs carrying NamedShardings, never real buffers)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from caesar_tpu.engine import step as step_mod
    from caesar_tpu.engine.kvcache import create_cache
    from caesar_tpu.engine.weights import init_params
    from caesar_tpu.parallel import plan as plan_mod

    # learn the plan's PartitionSpecs on the CPU mesh (device_put needs real
    # devices), then re-home them abstractly onto the target mesh
    cpu_mesh = plan_mod.make_mesh(
        mesh.shape["tp"], devices=jax.local_devices(backend="cpu")
    )
    params = plan_mod.shard_params(spec, init_params(spec, seed=0), cpu_mesh)
    cache = plan_mod.shard_cache(create_cache(spec, 64, 8, "f32"), cpu_mesh)

    def rehome(leaf):
        return jax.ShapeDtypeStruct(
            leaf.shape, leaf.dtype,
            sharding=NamedSharding(mesh, leaf.sharding.spec),
        )

    a_params = jax.tree.map(rehome, params)
    a_cache = jax.tree.map(rehome, cache)
    repl = NamedSharding(mesh, P())

    def r(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=repl)

    state = step_mod.DecodeState(
        tokens=r((batch,), jnp.int32), positions=r((batch,), jnp.int32),
        page_tables=r((batch, 8), jnp.int32), done=r((batch,), jnp.bool_),
        active=r((batch,), jnp.bool_), eos_floor=r((batch,), jnp.int32),
        stop_pos=r((batch,), jnp.int32),
        temperature=r((batch,), jnp.float32), top_k=r((batch,), jnp.int32),
        top_p=r((batch,), jnp.float32), rng=r((2,), jnp.uint32),
    )
    fn = step_mod.make_sharded_decode_steps(
        spec, mesh, a_params, a_cache, n_steps, use_kernel=use_kernel,
        microbatches=microbatches,
    )
    return fn, (a_params, a_cache, state, r((), jnp.int32))


def async_spans(hlo: str) -> list:
    """[(collective_name, ops_inside_span)] for each start/done pair.

    Matching is OPERAND-based, never shape-based: scheduled HLO prints
    tuple result shapes with layout annotations (`(f32[...]{1,0:T(8,128)},
    ...)`) whose nested parens and spaces defeat any shape regex — the
    first two cuts of this probe counted ZERO collectives in modules full
    of combined all-reduces for exactly that reason."""
    spans = []
    opened = {}  # name -> work count since its start
    for line in hlo.splitlines():
        m = re.match(
            r"\s*(?:ROOT )?%([\w.\-]+) = .*? (?:all-reduce|all-gather)"
            r"-start\(",
            line,
        )
        if m:
            opened[m.group(1)] = 0
            continue
        m = re.search(
            r"(?:all-reduce|all-gather)-done\(%?([\w.\-]+)", line
        )
        if m and m.group(1) in opened:
            spans.append((m.group(1), opened.pop(m.group(1))))
            continue
        if opened and _WORK.search(line):
            for k in opened:
                opened[k] += 1
    return spans


def count_all_reduces(hlo: str) -> dict:
    """{'sync': n, 'sync_combined': n, 'start': n, 'start_combined': n}
    — combined = >= 2 operands inside the op's argument list (operand
    lists are single-line and paren-free, unlike result shapes)."""
    out = {"sync": 0, "sync_combined": 0, "start": 0, "start_combined": 0}
    for m in re.finditer(r" all-reduce(-start)?\(([^)]*)\)", hlo):
        kind = "start" if m.group(1) else "sync"
        out[kind] += 1
        if m.group(2).count("%") >= 2:
            out[kind + "_combined"] += 1
    return out


def tpu_topology_hlo(microbatches: int) -> dict:
    """AOT-compile the TP=2 decode for a v5e:2x4 topology; return span stats."""
    import numpy as np
    import jax
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from caesar_tpu.engine.model import get_spec

    topo = topologies.get_topology_desc(topology_name="v5e:2x4", platform="tpu")
    mesh = Mesh(np.asarray(topo.devices[:2]), ("tp",))
    # 1.5b: real serving shapes (head_dim 128) but a fast compile
    spec = get_spec("qwen2.5-coder-1.5b")
    fn, args = _abstract_tp_args(
        spec, mesh, n_steps=2, batch=8, use_kernel=True,
        microbatches=microbatches,
    )
    hlo = fn.lower(*args).compile().as_text()
    spans = async_spans(hlo)
    return {
        "async_pairs": len(spans),
        "pairs_with_work_inside": sum(1 for _, w in spans if w > 0),
        "max_ops_inside_span": max((w for _, w in spans), default=0),
        **count_all_reduces(hlo),
    }


def cpu_mesh_hlo(microbatches: int) -> dict:
    """Compile on the virtual CPU mesh; count combined (tuple) all-reduces."""
    import jax

    from caesar_tpu.engine.model import get_spec
    from caesar_tpu.parallel import plan as plan_mod

    mesh = plan_mod.make_mesh(2, devices=jax.local_devices(backend="cpu"))
    spec = get_spec("tiny")
    fn, args = _abstract_tp_args(
        spec, mesh, n_steps=2, batch=4, use_kernel=False,
        microbatches=microbatches,
    )
    hlo = fn.lower(*args).compile().as_text()
    counts = count_all_reduces(hlo)
    return {
        "combined_all_reduces": counts["sync_combined"]
        + counts["start_combined"],
        "total_all_reduces": counts["sync"] + counts["start"],
    }


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpu_only = "--cpu-only" in sys.argv
    out = {"microbatches": mb}
    out["cpu_mesh"] = {
        "mb": cpu_mesh_hlo(mb),
        "mb1_control": cpu_mesh_hlo(1),
    }
    if not cpu_only:
        try:
            out["tpu_v5e_aot"] = {
                "mb": tpu_topology_hlo(mb),
                "mb1_control": tpu_topology_hlo(1),
            }
        except Exception as e:  # no TPU plugin on this host
            out["tpu_v5e_aot"] = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
