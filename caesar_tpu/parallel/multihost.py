"""Multi-host serving: process groups over DCN, meshes spanning hosts.

BASELINE.json config 5 (70B-class on a multi-host pod slice).  The shape of
multi-host serving here:

* every host runs the same engine process; `init_distributed()` wraps
  jax.distributed.initialize so all hosts join one JAX process group over
  DCN;
* the global mesh is (dp, tp) with **tp innermost and within a slice** —
  tensor-parallel collectives (the per-layer psums GSPMD inserts for the
  row-parallel projections) ride ICI, while dp is pure replication and
  crosses DCN only for control-plane traffic;
* each dp replica owns its own KV page pool and slot batch (engine
  replicas, service.py), so no KV ever crosses hosts: trajectories hash to
  a replica and stay there, keeping their prefix pages local (the
  `trajectory_id` routing in EngineGenerator);
* the work queue stays host-0-side (the harness driver); remote hosts run
  engine service processes reachable over the OpenAI-compatible HTTP API
  (engine/server.py), which is the DCN control plane — exactly the
  reference's worker/HTTP split (SURVEY.md §5.8) with the providers
  replaced by our own engines.

On this single-host machine the same code paths are exercised with
xla_force_host_platform_device_count (tests) and dryrun_multichip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host process group (no-op for single-process runs).

    With no arguments, jax.distributed auto-detects cluster environments
    (TPU pod metadata); explicit args serve manual bring-up:
        init_distributed("10.0.0.1:8476", num_processes=4, process_id=hex_id)
    """
    import jax

    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception:
            return  # single-process
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_multihost_mesh(tp: int, dp: int = 1, devices: Optional[Sequence] = None):
    """A (dp, tp) mesh over the GLOBAL device list.

    tp is the fast (minor) axis so each tp group is a contiguous run of
    devices — on TPU slices, contiguous global devices share ICI links, so
    the per-layer tensor-parallel collectives never touch DCN.  dp groups
    then differ in the major axis (across hosts when tp == devices-per-host).
    """
    import jax
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()  # global across processes
    needed = tp * dp
    if len(devices) < needed:
        raise ValueError(f"need {needed} devices, have {len(devices)}")
    grid = np.asarray(devices[:needed]).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def local_replica_id(mesh) -> int:
    """Which dp replica this host's process participates in (for routing
    admission to the replica whose devices are process-local)."""
    import jax

    local = set(d.id for d in jax.local_devices())
    mesh_devices = np.asarray(mesh.devices)
    for replica in range(mesh_devices.shape[0]):
        ids = {d.id for d in mesh_devices[replica].flat}
        if ids & local:
            return replica
    return 0
