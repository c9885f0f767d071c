"""Subprocess worker for the two-process jax.distributed test.

Each process plays one "host" of a 2-host pod (2 virtual CPU devices per
host): joins the process group over the coordinator, builds the global
(dp=2, tp=2) mesh, identifies its dp replica, runs a cross-process
collective over the global mesh, then serves a greedy generation on its
host-local tp=2 engine and prints everything as one JSON line for the
parent to compare.

Usage: python multihost_worker.py <process_id> <coordinator_port>
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main() -> None:
    process_id = int(sys.argv[1])
    port = sys.argv[2]

    from caesar_tpu.parallel.multihost import (
        init_distributed,
        local_replica_id,
        make_multihost_mesh,
    )

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())

    mesh = make_multihost_mesh(tp=2, dp=2)
    replica = local_replica_id(mesh)

    # cross-process collective over the global mesh: both processes supply
    # their dp shard; the jitted global sum runs collectives across the
    # process boundary (the DCN path on a real pod)
    local_part = np.full((2,), float(process_id + 1), dtype=np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), local_part, global_shape=(4,)
    )
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(arr)
    global_sum = float(total)

    # host-local tp=2 engine (the serving plane: tp rides ICI, never DCN)
    from caesar_tpu.config import EngineConfig
    from caesar_tpu.engine.engine import Engine
    from caesar_tpu.engine.model import get_spec
    from caesar_tpu.engine.tokenizer import ByteTokenizer
    from caesar_tpu.engine.weights import init_params
    from caesar_tpu.harness.generate import GenerateRequest
    from caesar_tpu.parallel.plan import make_mesh

    spec = get_spec("tiny")
    params = init_params(spec, seed=0, dtype=jnp.float32)
    econf = EngineConfig(
        model="tiny", quant="bf16", kv_quant="f32", page_size=16,
        num_pages=128, max_batch=2, max_seq_len=128, prefill_chunk=32,
        tp=2, prefix_cache=False,
    )
    engine = Engine(
        econf, spec=spec, params=params, tokenizer=ByteTokenizer(),
        decode_steps=4, mesh=make_mesh(2, jax.local_devices()),
    )
    try:
        result = engine.generate_sync(
            GenerateRequest(
                prompt="multi host parity", temperature=0.0, max_tokens=8,
                trajectory_id="mh",
            )
        )
        text = result.text
    finally:
        engine.close()

    print(
        json.dumps(
            {
                "process_id": process_id,
                "global_devices": n_global,
                "local_devices": n_local,
                "replica": replica,
                "global_sum": global_sum,
                "text": text,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
