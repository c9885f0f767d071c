"""In-memory record of one trajectory: everything every turn produced.

Equivalent of the reference's LLMTurnInfo (turn_info.py:5-49), redesigned as a
typed per-turn record instead of six parallel dicts guarded by
__getattr__/__setattr__ tricks. The per-field views (`.prompt`, `.kernel_code`,
...) are kept as mapping properties because the prompt-builder decision tree
consumes exactly those shapes (reference utils.py:297-461).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

from caesar_tpu.evalkit.result import KernelExecResult

#: Names of the per-turn fields, in canonical journal order.
TURN_FIELDS = (
    "prompt",
    "model_response",
    "token_usage",
    "kernel_code",
    "eval_result",
    "profiler_result",
)


@dataclasses.dataclass
class TurnRecord:
    """Everything one turn produced. Empty-string/empty-dict defaults match
    the journal's on-disk defaults (reference logger.py:81-88)."""

    prompt: str = ""
    model_response: str = ""
    token_usage: dict = dataclasses.field(default_factory=dict)
    kernel_code: str = ""
    eval_result: KernelExecResult | dict = dataclasses.field(default_factory=dict)
    profiler_result: str = ""

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        if isinstance(self.eval_result, KernelExecResult):
            d["eval_result"] = self.eval_result.to_dict()
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "TurnRecord":
        return cls(
            prompt=d.get("prompt", "") or "",
            model_response=d.get("model_response", "") or "",
            token_usage=dict(d.get("token_usage", {}) or {}),
            kernel_code=d.get("kernel_code", "") or "",
            eval_result=KernelExecResult.from_dict(d.get("eval_result", {})),
            profiler_result=d.get("profiler_result", "") or "",
        )

    @property
    def complete(self) -> bool:
        """A turn is complete when prompt, response, and kernel all exist —
        the recovery-truncation criterion (reference state_machine.py:131-137).
        """
        return bool(self.prompt) and bool(self.model_response) and bool(self.kernel_code)


class _FieldView:
    """Read/write mapping view over one field across all turns."""

    def __init__(self, info: "TrajectoryInfo", field: str, default: Any):
        self._info = info
        self._field = field
        self._default = default

    def __getitem__(self, turn: int) -> Any:
        return getattr(self._info.turn(turn), self._field)

    def __setitem__(self, turn: int, value: Any) -> None:
        setattr(self._info.turn(turn), self._field, value)

    def get(self, turn: int, default: Any = None) -> Any:
        if turn in self._info.turns:
            return getattr(self._info.turns[turn], self._field)
        return default

    def keys(self):
        return self._info.turns.keys()

    def items(self):
        return ((t, getattr(r, self._field)) for t, r in self._info.turns.items())

    def values(self):
        return (getattr(r, self._field) for r in self._info.turns.values())

    def __iter__(self):
        return iter(self._info.turns)

    def __len__(self) -> int:
        return len(self._info.turns)

    def __contains__(self, turn: object) -> bool:
        return turn in self._info.turns


class TrajectoryInfo:
    """Typed container of TurnRecords keyed by 1-based turn number."""

    def __init__(self) -> None:
        self.turns: Dict[int, TurnRecord] = {}

    def turn(self, k: int) -> TurnRecord:
        """Get (or lazily create) turn k's record."""
        if k not in self.turns:
            self.turns[k] = TurnRecord()
        return self.turns[k]

    # --- per-field mapping views (the prompt builder's input shapes) ---
    @property
    def prompt(self) -> _FieldView:
        return _FieldView(self, "prompt", "")

    @property
    def model_response(self) -> _FieldView:
        return _FieldView(self, "model_response", "")

    @property
    def token_usage(self) -> _FieldView:
        return _FieldView(self, "token_usage", {})

    @property
    def kernel_code(self) -> _FieldView:
        return _FieldView(self, "kernel_code", "")

    @property
    def eval_result(self) -> _FieldView:
        return _FieldView(self, "eval_result", {})

    @property
    def profiler_result(self) -> _FieldView:
        return _FieldView(self, "profiler_result", "")

    def update_turn_data(self, turn: int, data: dict) -> None:
        """Replace turn `turn` from a dict of field values (missing fields
        reset to defaults — matching reference turn_info.py:43-49)."""
        self.turns[turn] = TurnRecord.from_dict(data)

    def __getitem__(self, turn: int) -> dict:
        """Dict snapshot of a turn (reference turn_info.py:30-40 semantics)."""
        rec = self.turns.get(turn, TurnRecord())
        return {
            "prompt": rec.prompt,
            "model_response": rec.model_response,
            "token_usage": rec.token_usage,
            "kernel_code": rec.kernel_code,
            "eval_result": rec.eval_result if rec.eval_result != {} else {},
            "profiler_result": rec.profiler_result,
        }
