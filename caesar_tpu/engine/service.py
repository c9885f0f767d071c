"""EngineGenerator: the harness-facing adapter over the serving engine.

Implements the Generator protocol (harness/generate.py) so the trajectory
state machine's GENERATE state awaits the in-house engine exactly as it
would any backend — the seam where the reference called query_server
(state_machine.py:226-248).  With engine.dp > 1 a replica group is built:
requests hash by trajectory_id onto replicas so one trajectory's turns land
on the same replica and its prefix pages stay hot.
"""

from __future__ import annotations

from typing import List

from caesar_tpu.engine.engine import Engine
from caesar_tpu.harness.generate import GenerateRequest, GenerateResult


class EngineGenerator:
    def __init__(self, engines: List[Engine]):
        self.engines = engines

    @classmethod
    def from_config(cls, config) -> "EngineGenerator":
        econf = config.engine
        engines: List[Engine] = []
        if econf.tp > 1 or econf.dp > 1:
            import jax

            from caesar_tpu.parallel.plan import make_mesh

            devices = jax.devices()
            needed = econf.tp * econf.dp
            if len(devices) < needed:
                raise RuntimeError(
                    f"engine.tp*dp={needed} devices required, "
                    f"{len(devices)} available"
                )
            for replica in range(econf.dp):
                sub = devices[replica * econf.tp : (replica + 1) * econf.tp]
                engines.append(Engine(econf, mesh=make_mesh(econf.tp, sub)))
        else:
            engines.append(Engine(econf))
        return cls(engines)

    def _pick(self, request: GenerateRequest) -> Engine:
        if len(self.engines) == 1:
            return self.engines[0]
        return self.engines[hash(request.trajectory_id) % len(self.engines)]

    async def generate(self, request: GenerateRequest) -> GenerateResult:
        return await self._pick(request).generate(request)

    async def close(self) -> None:
        for engine in self.engines:
            await engine.aclose()

    def stats(self) -> List[dict]:
        return [e.stats.snapshot(e.prefix_cache) for e in self.engines]
