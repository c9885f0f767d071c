"""Workflow topologies: Outcome -> next TrajectoryState tables.

Mirrors the reference's pluggable transition framework (transition.py:6-36,
custom_transitions.py:7-64): a topology is a total mapping over Outcome,
validated at construction time so an unmapped outcome fails fast instead of
mid-trajectory.

Unlike the reference (an ABC subclassing Dict), a topology here is plain data:
a frozen mapping plus a name. New topologies are one dict literal away, and
tables can be serialized into the run's config.json for self-describing runs.
"""

from __future__ import annotations

from types import MappingProxyType
from typing import Mapping

from caesar_tpu.harness.states import Outcome, TrajectoryState


class Transition:
    """A validated, immutable Outcome -> TrajectoryState table."""

    def __init__(self, name: str, table: Mapping[Outcome, TrajectoryState]):
        missing = [o for o in Outcome if o not in table]
        if missing:
            raise ValueError(
                f"Transition '{name}' is missing mappings for outcomes: "
                f"{[o.name for o in missing]}"
            )
        extra = [o for o in table if not isinstance(o, Outcome)]
        if extra:
            raise ValueError(f"Transition '{name}' has non-Outcome keys: {extra}")
        self.name = name
        self._table = MappingProxyType(dict(table))

    def __getitem__(self, outcome: Outcome) -> TrajectoryState:
        return self._table[outcome]

    def __contains__(self, outcome: object) -> bool:
        return outcome in self._table

    def to_dict(self) -> dict:
        return {o.value: s.value for o, s in self._table.items()}

    def __repr__(self) -> str:
        return f"Transition({self.name!r})"


def _make(name: str, table: dict) -> Transition:
    return Transition(name, table)


#: Chat-only loop — generation and reflection with no compile/eval states.
#: Reference: InferenceOnlyNoGPUTransition (custom_transitions.py:7-24).
ChatOnlyTransition = _make(
    "chat_only",
    {
        Outcome.Start: TrajectoryState.GENERATE,
        Outcome.GenerateSuccess: TrajectoryState.FINISH,
        Outcome.GenerateFail: TrajectoryState.FINISH,
        Outcome.Finish: TrajectoryState.START,
        Outcome.CompileSuccess: TrajectoryState.NONE,
        Outcome.CompileFail: TrajectoryState.NONE,
        Outcome.CorrectnessSuccess: TrajectoryState.NONE,
        Outcome.CorrectnessFail: TrajectoryState.NONE,
        Outcome.Performance: TrajectoryState.NONE,
    },
)

#: Compile + correctness check each turn, no profiler.
#: Reference: InferenceAndGPUTransition (custom_transitions.py:27-44).
CompileAndCheckTransition = _make(
    "compile_and_check",
    {
        Outcome.Start: TrajectoryState.GENERATE,
        Outcome.GenerateSuccess: TrajectoryState.COMPILE,
        Outcome.GenerateFail: TrajectoryState.FINISH,
        Outcome.CompileSuccess: TrajectoryState.CORRECTNESS,
        Outcome.CompileFail: TrajectoryState.FINISH,
        Outcome.CorrectnessSuccess: TrajectoryState.FINISH,
        Outcome.CorrectnessFail: TrajectoryState.FINISH,
        Outcome.Finish: TrajectoryState.START,
        Outcome.Performance: TrajectoryState.NONE,
    },
)

#: Full loop: compile, correctness, and profiler feedback on correct kernels.
#: Reference: InferenceAndGPUAndProfilerTransition (custom_transitions.py:47-64)
#: — the topology the reference's main.py:93 instantiates.
FullFeedbackTransition = _make(
    "full_feedback",
    {
        Outcome.Start: TrajectoryState.GENERATE,
        Outcome.GenerateSuccess: TrajectoryState.COMPILE,
        Outcome.GenerateFail: TrajectoryState.FINISH,
        Outcome.CompileSuccess: TrajectoryState.CORRECTNESS,
        Outcome.CompileFail: TrajectoryState.FINISH,
        Outcome.CorrectnessSuccess: TrajectoryState.PERFORMANCE,
        Outcome.CorrectnessFail: TrajectoryState.FINISH,
        Outcome.Performance: TrajectoryState.FINISH,
        Outcome.Finish: TrajectoryState.START,
    },
)

TRANSITIONS_BY_NAME = {
    t.name: t
    for t in (ChatOnlyTransition, CompileAndCheckTransition, FullFeedbackTransition)
}


def get_transition(name: str) -> Transition:
    try:
        return TRANSITIONS_BY_NAME[name]
    except KeyError:
        raise KeyError(
            f"Unknown transition '{name}'; available: {sorted(TRANSITIONS_BY_NAME)}"
        ) from None
