import pytest

from caesar_tpu.harness.states import Outcome, TrajectoryState
from caesar_tpu.harness.transitions import (
    ChatOnlyTransition,
    CompileAndCheckTransition,
    FullFeedbackTransition,
    Transition,
    get_transition,
)


def test_all_outcomes_mapped_in_shipped_topologies():
    for t in (ChatOnlyTransition, CompileAndCheckTransition, FullFeedbackTransition):
        for outcome in Outcome:
            assert t[outcome] in TrajectoryState


def test_missing_outcome_rejected():
    with pytest.raises(ValueError, match="missing mappings"):
        Transition("partial", {Outcome.Start: TrajectoryState.GENERATE})


def test_full_feedback_happy_path_walk():
    t = FullFeedbackTransition
    assert t[Outcome.Start] is TrajectoryState.GENERATE
    assert t[Outcome.GenerateSuccess] is TrajectoryState.COMPILE
    assert t[Outcome.CompileSuccess] is TrajectoryState.CORRECTNESS
    assert t[Outcome.CorrectnessSuccess] is TrajectoryState.PERFORMANCE
    assert t[Outcome.Performance] is TrajectoryState.FINISH
    assert t[Outcome.Finish] is TrajectoryState.START


def test_failures_short_circuit_to_finish():
    t = FullFeedbackTransition
    for outcome in (Outcome.GenerateFail, Outcome.CompileFail, Outcome.CorrectnessFail):
        assert t[outcome] is TrajectoryState.FINISH


def test_chat_only_never_touches_eval_states():
    t = ChatOnlyTransition
    assert t[Outcome.GenerateSuccess] is TrajectoryState.FINISH
    assert t[Outcome.CompileSuccess] is TrajectoryState.NONE


def test_get_transition_by_name():
    assert get_transition("full_feedback") is FullFeedbackTransition
    with pytest.raises(KeyError):
        get_transition("nope")


def test_to_dict_serializable():
    d = FullFeedbackTransition.to_dict()
    assert d["start"] == "generate"
    assert len(d) == len(Outcome)
