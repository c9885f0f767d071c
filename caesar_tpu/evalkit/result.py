"""The canonical kernel-evaluation record.

One type serves every layer (state machine, journal, prompt builder, analysis)
— the reference instead round-trips KernelExecResult through plain dicts and
rehydrates on load (logger.py:68-71, utils.py:27-41), which SURVEY.md §7.4
flags as fragile; here (de)serialization lives on the type itself.

Field semantics follow the reference contract (KernelBenchInternal's
KernelExecResult as used at state_machine.py:287-305, eval.py:86-115):
`runtime` is milliseconds, -1.0 when invalid; `metadata` carries the
structured error classification that doubles as model feedback
(compiler_error / correctness_issue / runtime_error / timeout_error / ...).
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass
class KernelExecResult:
    compiled: bool = False
    correctness: bool = False
    metadata: dict = dataclasses.field(default_factory=dict)
    runtime: float = -1.0  # milliseconds; -1.0 == not measured / invalid
    runtime_stats: dict = dataclasses.field(default_factory=dict)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: Any) -> "KernelExecResult | Any":
        """Rehydrate from a journal dict; pass through anything else.

        Mirrors the tolerant behavior of the reference's exec_log_to_obj
        (utils.py:27-41): strings and already-typed values are returned as-is
        so partially-written logs stay loadable.
        """
        if isinstance(d, (cls, str)):
            return d
        if not isinstance(d, dict):
            return d
        runtime = d.get("runtime", -1.0)
        return cls(
            compiled=bool(d.get("compiled", False)),
            correctness=bool(d.get("correctness", False)),
            metadata=dict(d.get("metadata", {}) or {}),
            runtime=-1.0 if runtime is None else float(runtime),
            runtime_stats=dict(d.get("runtime_stats", {}) or {}),
        )

    @property
    def valid_runtime(self) -> bool:
        return self.runtime is not None and self.runtime != -1.0
