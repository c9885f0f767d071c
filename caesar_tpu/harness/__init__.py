"""Control plane: trajectory state machine and its supporting cast."""

from caesar_tpu.harness.states import TrajectoryState, Outcome
from caesar_tpu.harness.transitions import (
    Transition,
    ChatOnlyTransition,
    CompileAndCheckTransition,
    FullFeedbackTransition,
)
from caesar_tpu.harness.work import WorkItem
from caesar_tpu.harness.turn_info import TrajectoryInfo

__all__ = [
    "TrajectoryState",
    "Outcome",
    "Transition",
    "ChatOnlyTransition",
    "CompileAndCheckTransition",
    "FullFeedbackTransition",
    "WorkItem",
    "TrajectoryInfo",
]
