"""State and outcome vocabulary for the trajectory workflow.

Same logical vocabulary as the reference's states.py:4-38 (CaesarState /
StateOutcome): each turn of a trajectory walks START -> GENERATE -> COMPILE ->
CORRECTNESS -> PERFORMANCE -> FINISH, with failure outcomes short-circuiting
to FINISH so the recorded failure becomes next turn's feedback.

Outcomes are state-specific by construction; a transition table maps every
outcome to the next state (see transitions.py).
"""

from __future__ import annotations

import enum


class TrajectoryState(enum.Enum):
    """States of the per-trajectory workflow."""

    START = "start"
    GENERATE = "generate"
    COMPILE = "compile"
    CORRECTNESS = "correctness"
    PERFORMANCE = "performance"
    FINISH = "finish"
    NONE = "none"  # unreachable sink for outcomes a topology disables


class Outcome(enum.Enum):
    """Possible outcomes of each state; each belongs to exactly one state."""

    # START
    Start = "start"

    # GENERATE
    GenerateSuccess = "generate_success"
    GenerateFail = "generate_fail"

    # COMPILE
    CompileSuccess = "compile_success"
    CompileFail = "compile_fail"

    # CORRECTNESS
    CorrectnessSuccess = "correctness_success"
    CorrectnessFail = "correctness_fail"

    # PERFORMANCE
    Performance = "performance"

    # FINISH
    Finish = "finish"
