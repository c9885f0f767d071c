"""Decision-tree tests for the turn-context builder.

The prompt-building decision tree (reference utils.py:297-461) is the most
branch-heavy pure logic in the harness; these tests pin its semantics.
"""

from caesar_tpu.evalkit.result import KernelExecResult
from caesar_tpu.harness.context import (
    best_kernel_turn,
    build_prompt_for_turn,
    generate_initial_prompt,
    last_kernel_turn,
)
from caesar_tpu.harness.prompts import PALLAS_PACK
from caesar_tpu.harness.strategy import Strategy

ALL = {
    Strategy.SHOW_INLINE_SYNTAX,
    Strategy.COMPILER_FEEDBACK,
    Strategy.CORRECTNESS_FEEDBACK,
    Strategy.PROFILER_FEEDBACK,
}

REF_SRC = "class Model: pass"


def ok_result(runtime):
    return KernelExecResult(
        compiled=True,
        correctness=True,
        metadata={"hardware": "mock", "device": "mock:0"},
        runtime=runtime,
    )


def compile_fail(msg="bad syntax"):
    return KernelExecResult(
        compiled=False,
        correctness=False,
        metadata={"compiler_error": msg, "hardware": "mock", "device": "mock:0"},
    )


def correctness_fail(issue="value mismatch"):
    return KernelExecResult(
        compiled=True,
        correctness=False,
        metadata={"correctness_issue": issue, "hardware": "mock", "device": "mock:0"},
    )


def build(turn, kernels, evals, profiles, strategy=ALL, **kw):
    return build_prompt_for_turn(
        turn,
        REF_SRC,
        kernels,
        evals,
        profiles,
        strategy,
        pack=PALLAS_PACK,
        **kw,
    )


# ----------------------------------------------------------------------
# best/last selection (reference utils.py:464-496)
# ----------------------------------------------------------------------

def test_best_kernel_is_min_valid_runtime():
    evals = {1: ok_result(5.0), 2: ok_result(2.0), 3: compile_fail()}
    assert best_kernel_turn(evals) == 2


def test_best_kernel_none_when_nothing_ran():
    assert best_kernel_turn({1: compile_fail()}) is None
    assert best_kernel_turn({}) is None


def test_best_kernel_skips_invalid_runtime():
    evals = {1: ok_result(-1.0), 2: ok_result(3.0)}
    assert best_kernel_turn(evals) == 2


def test_last_kernel_is_latest_nonempty():
    assert last_kernel_turn({1: "a", 2: "", 3: "c"}) == 3
    assert last_kernel_turn({1: "a", 2: "b", 3: ""}) == 2
    assert last_kernel_turn({1: ""}) is None


# ----------------------------------------------------------------------
# turn 1 and degenerate cases (utils.py:314-324)
# ----------------------------------------------------------------------

def test_turn1_is_initial_prompt_plus_instruction():
    p = build(1, {}, {}, {})
    assert p.startswith(PALLAS_PACK.task_description)
    assert p.endswith(PALLAS_PACK.initial_instruction)
    assert REF_SRC in p


def test_syntax_example_gated_by_strategy():
    with_ex = build(1, {}, {}, {}, strategy=ALL)
    without_ex = build(1, {}, {}, {}, strategy=ALL - {Strategy.SHOW_INLINE_SYNTAX})
    assert "worked example" in with_ex
    assert "worked example" not in without_ex
    assert len(with_ex) > len(without_ex)


def test_later_turn_with_no_kernels_reprompts_initial():
    p = build(3, {1: "", 2: ""}, {}, {})
    assert p.endswith(PALLAS_PACK.initial_instruction)


# ----------------------------------------------------------------------
# kernel block selection (utils.py:346-357)
# ----------------------------------------------------------------------

def test_single_kernel_block_when_no_best():
    kernels = {1: "k1"}
    evals = {1: compile_fail()}
    p = build(2, kernels, evals, {}, strategy={Strategy.SHOW_INLINE_SYNTAX})
    assert "k1" in p
    assert "best kernel" not in p.lower()


def test_single_kernel_block_when_best_is_last():
    kernels = {1: "k1"}
    evals = {1: ok_result(1.0)}
    p = build(2, kernels, evals, {}, strategy=set())
    assert "previously generated kernel" in p.lower()


def test_best_and_last_blocks_when_different():
    kernels = {1: "FAST_KERNEL", 2: "SLOW_KERNEL"}
    evals = {1: ok_result(1.0), 2: ok_result(9.0)}
    p = build(3, kernels, evals, {}, strategy=set())
    assert "FAST_KERNEL" in p
    assert "SLOW_KERNEL" in p
    assert p.index("FAST_KERNEL") < p.index("SLOW_KERNEL")


# ----------------------------------------------------------------------
# feedback priority: compiler > correctness > profiler (utils.py:378-461)
# ----------------------------------------------------------------------

def test_compiler_feedback_takes_priority():
    kernels = {1: "k1"}
    evals = {1: compile_fail("nvcc exploded")}
    profiles = {1: "profile table"}
    p = build(2, kernels, evals, profiles)
    assert "nvcc exploded" in p
    assert p.endswith(PALLAS_PACK.reflection_compiler_instruction)
    assert "profile table" not in p


def test_compiler_feedback_includes_first_meta_key():
    evals = {1: compile_fail("boom")}
    p = build(2, {1: "k"}, evals, {})
    assert "compiler_error: boom" in p


def test_correctness_feedback_when_compiled_but_wrong():
    kernels = {1: "k1"}
    evals = {1: correctness_fail("max abs diff 3.2")}
    p = build(2, kernels, evals, {})
    assert "max abs diff 3.2" in p
    assert p.endswith(PALLAS_PACK.reflection_correctness_instruction)


def test_correctness_feedback_falls_back_to_runtime_error():
    res = KernelExecResult(
        compiled=True,
        correctness=False,
        metadata={"runtime_error": "XlaRuntimeError: oom"},
    )
    p = build(2, {1: "k"}, {1: res}, {})
    assert "XlaRuntimeError: oom" in p


def test_profiler_feedback_for_best_kernel():
    kernels = {1: "k1"}
    evals = {1: ok_result(2.5)}
    profiles = {1: "HLO table here"}
    p = build(2, kernels, evals, profiles)
    assert "HLO table here" in p
    assert "2.5" in p
    assert p.endswith(PALLAS_PACK.reflection_profiler_instruction)


def test_profiler_feedback_includes_slower_last_kernel():
    kernels = {1: "fast", 2: "slow"}
    evals = {1: ok_result(1.0), 2: ok_result(5.0)}
    profiles = {1: "BEST_TABLE", 2: "LAST_TABLE"}
    p = build(3, kernels, evals, profiles)
    assert "BEST_TABLE" in p
    assert "LAST_TABLE" in p


def test_profiler_feedback_omits_last_without_profile():
    kernels = {1: "fast", 2: "slow"}
    evals = {1: ok_result(1.0), 2: compile_fail()}
    profiles = {1: "BEST_TABLE"}
    p = build(3, kernels, evals, profiles)
    # compile fail on last kernel wins priority over profiler feedback
    assert p.endswith(PALLAS_PACK.reflection_compiler_instruction)


def test_profiler_feedback_truncated():
    kernels = {1: "k"}
    evals = {1: ok_result(1.0)}
    profiles = {1: "A" * 10000}
    p = build(2, kernels, evals, profiles, max_profiler_chars=4000)
    assert "A" * 4000 in p
    assert "A" * 4001 not in p


def test_no_feedback_plain_reflection():
    kernels = {1: "k"}
    evals = {1: ok_result(1.0)}
    p = build(2, kernels, evals, {}, strategy={Strategy.SHOW_INLINE_SYNTAX})
    assert p.endswith(PALLAS_PACK.reflection_instruction)


def test_metadata_not_mutated_by_prompt_build():
    res = compile_fail("err")
    meta_before = dict(res.metadata)
    build(2, {1: "k"}, {1: res}, {})
    assert res.metadata == meta_before  # reference mutated via pop()


# ----------------------------------------------------------------------
# last_only context mode (SURVEY.md §5.6 use_last_only knob)
# ----------------------------------------------------------------------

def test_last_only_hides_best_kernel():
    kernels = {1: "FAST_KERNEL", 2: "SLOW_KERNEL"}
    evals = {1: ok_result(1.0), 2: ok_result(9.0)}
    profiles = {1: "BEST_TABLE", 2: "LAST_TABLE"}
    p = build(3, kernels, evals, profiles, context_mode="last_only")
    assert "FAST_KERNEL" not in p
    assert "SLOW_KERNEL" in p
    assert "BEST_TABLE" not in p
    assert "LAST_TABLE" in p


def test_initial_prompt_is_stable_prefix_across_turns():
    """The initial prompt must be byte-identical across turns — it is the
    prefix the serving engine's prefix cache reuses (SURVEY.md §5.7)."""
    initial = generate_initial_prompt(REF_SRC, ALL, PALLAS_PACK)
    for turn, kernels, evals in [
        (1, {}, {}),
        (2, {1: "k"}, {1: ok_result(1.0)}),
        (5, {1: "k", 4: "k4"}, {1: compile_fail()}),
    ]:
        p = build(turn, kernels, evals, {})
        assert p.startswith(initial)
