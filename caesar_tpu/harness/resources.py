"""Slice resource manager: co-schedules eval slots and device meshes.

The TPU-native successor of the reference's GPUOrchestrator
(orchestrator.py:16-62), per BASELINE.json's north star.  The reference
time-shared N whole GPUs across M worker processes with an mp.Semaphore +
status array; here the two resource classes are:

* eval slots — host-CPU subprocess slots for kernel compile/eval/profile
  (the state machine's COMPILE/CORRECTNESS/PERFORMANCE states);
* the device mesh — owned exclusively by the serving engine, which
  multiplexes all GENERATE work internally via continuous batching, so
  generation needs no per-trajectory reservation at all.

Within one host this is asyncio (trajectories are tasks, not processes); a
status vector is kept for observability parity with the reference's
gpu_status array (orchestrator.py:23).  The latent reference hazard of
``get_available_gpu`` returning None under semaphore/array desync
(orchestrator.py:41, SURVEY.md §5.2) cannot arise: slot ids are handed out
under the same lock that tracks them.
"""

from __future__ import annotations

import asyncio
import contextlib
from typing import AsyncIterator, List


class SliceResourceManager:
    def __init__(self, eval_slots: int = 2):
        if eval_slots < 1:
            raise ValueError("need at least one eval slot")
        self.num_eval_slots = eval_slots
        self._sem = asyncio.Semaphore(eval_slots)
        self._lock = asyncio.Lock()
        self._status: List[int] = [0] * eval_slots  # 0 free, 1 busy

    @contextlib.asynccontextmanager
    async def reserve_eval_slot(self) -> AsyncIterator[int]:
        """Reserve one eval slot; yields its id (reference
        reserve_gpu() contract, orchestrator.py:48-57)."""
        await self._sem.acquire()
        async with self._lock:
            slot = self._status.index(0)
            self._status[slot] = 1
        try:
            yield slot
        finally:
            async with self._lock:
                self._status[slot] = 0
            self._sem.release()

    def status(self) -> List[int]:
        return list(self._status)

    @property
    def busy(self) -> int:
        return sum(self._status)
