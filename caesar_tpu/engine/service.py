"""EngineGenerator: the harness-facing adapter over the serving engine.

Implements the Generator protocol (harness/generate.py) so the trajectory
state machine's GENERATE state awaits the in-house engine exactly as it
would any backend — the seam where the reference called query_server
(state_machine.py:226-248).

Topology (SURVEY.md §5.8's TPU-native stack):

* ``engine.dp > 1`` — a local replica group: each replica owns its own
  submesh, KV pool, and slot batch over this host's devices.
* ``engine.num_hosts > 1`` / ``engine.coordinator_address`` — multi-host:
  ``jax.distributed`` joins all engine-service processes into one group
  over DCN (parallel/multihost.py), tp stays on host-local ICI, and
  ``engine.peer_addresses`` lists the OTHER hosts' engine servers so the
  driver routes trajectories across the pod over HTTP (the control plane;
  KV never crosses hosts — a trajectory's turns stay on one replica and
  its prefix pages stay hot).

Routing is a STABLE hash of trajectory_id (crc32, not Python's per-process
salted hash — reference defect list, SURVEY.md §7.4) so every host computes
the same placement.
"""

from __future__ import annotations

import zlib
from typing import List, Sequence

from caesar_tpu.engine.engine import Engine
from caesar_tpu.harness.generate import (
    GenerateRequest,
    GenerateResult,
    Generator,
    HttpGenerator,
)


def stable_trajectory_hash(trajectory_id: str) -> int:
    """Process-stable routing hash (Python's hash() is salted per process,
    which would scatter one trajectory's turns across replicas on resume)."""
    return zlib.crc32(trajectory_id.encode())


class EngineGenerator:
    def __init__(
        self,
        engines: List[Engine],
        remotes: Sequence[Generator] = (),
    ):
        self.engines = list(engines)
        self.remotes = list(remotes)
        self._backends: List = self.engines + self.remotes

    @classmethod
    def from_config(cls, config) -> "EngineGenerator":
        econf = config.engine
        if econf.num_hosts > 1 or econf.coordinator_address:
            from caesar_tpu.parallel.multihost import init_distributed

            init_distributed(
                econf.coordinator_address or None,
                econf.num_hosts if econf.num_hosts > 1 else None,
                econf.host_id if econf.host_id >= 0 else None,
            )
        import jax

        from caesar_tpu.parallel.plan import make_mesh

        # each host serves replicas over its OWN devices; jax.devices() is
        # global under jax.distributed, so local_devices is the correct pool
        devices = jax.local_devices()
        engines: List[Engine] = []
        needed = econf.tp * econf.dp
        if econf.tp > 1 or econf.dp > 1:
            if len(devices) < needed:
                raise RuntimeError(
                    f"engine.tp*dp={needed} devices required per host, "
                    f"{len(devices)} available"
                )
            for replica in range(econf.dp):
                sub = devices[replica * econf.tp : (replica + 1) * econf.tp]
                engines.append(Engine(econf, mesh=make_mesh(econf.tp, sub)))
        else:
            engines.append(Engine(econf))

        remotes = [
            HttpGenerator(addr, None, config.model_name,
                          timeout=config.timeout, api="completions")
            for addr in econf.peer_addresses
        ]
        return cls(engines, remotes)

    def _pick(self, request: GenerateRequest):
        if len(self._backends) == 1:
            return self._backends[0]
        return self._backends[
            stable_trajectory_hash(request.trajectory_id)
            % len(self._backends)
        ]

    async def generate(self, request: GenerateRequest) -> GenerateResult:
        backend = self._pick(request)
        if isinstance(backend, Engine):
            return await backend.generate(request)
        return await backend.generate(request)

    async def close(self) -> None:
        for engine in self.engines:
            await engine.aclose()
        for remote in self.remotes:
            await remote.close()

    def stats(self) -> List[dict]:
        return [e.stats.snapshot(e.prefix_cache) for e in self.engines]
