"""Turn-context builder: decides what the model sees each turn.

This is the behavioral heart of the harness, matching the reference's
build_llm_prompt_for_turn decision tree (utils.py:297-461) exactly:

* The prompt is REBUILT from scratch every turn — not an appended chat.  The
  shared prefix across all turns/samples of a problem is the initial prompt
  (task description [+ syntax example] + architecture), which is what the
  serving engine's prefix cache keys on.
* Turn 1, or any turn with no kernel generated yet, gets the initial
  instruction (utils.py:314-324).
* Later turns include the best and/or last kernel (utils.py:333-357) and then
  exactly ONE feedback block, chosen by priority
  compiler-error > correctness-error > profiler (utils.py:378-457), each with
  its matching reflection instruction; with no applicable feedback, a plain
  reflection instruction (utils.py:460-461).
* Profiler feedback is truncated to `max_profiler_chars` characters
  (state_machine.py:214 pins 4000).

Deliberate fixes/extensions over the reference (SURVEY.md §5.6, §7.4):

* `last_only` context mode is a real knob (the reference's scripts passed a
  `use_last_only` flag that config never defined): only the last kernel and
  its feedback are shown, never the best-kernel block.
* The reference mutates eval metadata in place while building prompts
  (`metadata.pop`, utils.py:384-385); we read through a filtered copy.
"""

from __future__ import annotations

import os
from typing import Mapping, Optional, Set

from caesar_tpu.evalkit.result import KernelExecResult
from caesar_tpu.harness.prompts import PromptPack, get_pack
from caesar_tpu.harness.strategy import Strategy

_EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "examples")

#: metadata keys that describe the machine, not the failure — excluded from
#: model feedback (reference pops these, utils.py:384-385, 404-405)
_NON_FEEDBACK_KEYS = ("hardware", "device")


def _read(path: str) -> str:
    with open(path, "r") as f:
        return f.read()


def load_syntax_example(pack: PromptPack) -> tuple[str, str]:
    """Load the (reference arch, optimized arch) example pair for a pack."""
    d = os.path.join(_EXAMPLES_DIR, pack.name)
    return (
        _read(os.path.join(d, "model_ex_add.py")),
        _read(os.path.join(d, "model_new_ex_add.py")),
    )


def generate_initial_prompt(
    ref_arch_src: str,
    strategy: Set[Strategy],
    pack: PromptPack,
) -> str:
    """The shared per-problem prefix (reference utils.py:264-294)."""
    prompt = pack.task_description
    if Strategy.SHOW_INLINE_SYNTAX in strategy:
        example_arch, example_new_arch = load_syntax_example(pack)
        prompt += pack.inline_syntax_example.format(
            example_arch_src=example_arch, example_new_arch_src=example_new_arch
        )
    prompt += pack.kernel_to_optimize.format(arch_src=ref_arch_src)
    return prompt


def _as_result(value: object) -> KernelExecResult:
    """Normalize a journal/eval entry into a KernelExecResult view."""
    if isinstance(value, KernelExecResult):
        return value
    if isinstance(value, dict) and value:
        return KernelExecResult.from_dict(value)
    return KernelExecResult()


def _feedback_metadata(result: KernelExecResult) -> dict:
    return {
        k: v for k, v in result.metadata.items() if k not in _NON_FEEDBACK_KEYS
    }


def best_kernel_turn(eval_result: Mapping[int, object]) -> Optional[int]:
    """Turn index of the fastest valid kernel, else None
    (reference _get_best_kernel_code, utils.py:464-482)."""
    best_runtime = float("inf")
    best_idx: Optional[int] = None
    for idx in sorted(eval_result.keys()):
        res = _as_result(eval_result[idx])
        if res.valid_runtime and res.runtime < best_runtime:
            best_runtime = res.runtime
            best_idx = idx
    return best_idx


def last_kernel_turn(kernels: Mapping[int, str]) -> Optional[int]:
    """Turn index of the most recent non-empty kernel, else None
    (reference _get_last_kernel_code, utils.py:485-496)."""
    last_idx: Optional[int] = None
    for idx in sorted(kernels.keys()):
        if kernels[idx] != "":
            last_idx = idx
    return last_idx


def build_prompt_for_turn(
    turn: int,
    ref_arch_src: str,
    kernels: Mapping[int, str],
    eval_result: Mapping[int, object],
    profiler_result: Mapping[int, str],
    strategy: Set[Strategy],
    max_profiler_chars: int = 4000,
    pack: PromptPack | str = "pallas",
    context_mode: str = "best_and_last",
) -> str:
    """Build the full prompt for `turn` from the trajectory so far."""
    if isinstance(pack, str):
        pack = get_pack(pack)

    prompt = generate_initial_prompt(ref_arch_src, strategy, pack)

    # Turn 1, or nothing usable generated yet: initial instruction.
    if turn == 1 or kernels is None or all(not v for v in kernels.values()):
        return prompt + pack.initial_instruction

    best_idx = best_kernel_turn(eval_result)
    last_idx = last_kernel_turn(kernels)
    assert last_idx is not None  # guaranteed by the all-empty check above

    if context_mode == "last_only":
        best_idx = None  # never surface the best-kernel block

    # --- previous kernel block(s) (utils.py:346-357) ---
    if best_idx is None or best_idx == last_idx:
        prompt += pack.previously_generated_kernel.format(
            prev_kernel_code=kernels[last_idx]
        )
    else:
        prompt += pack.previously_generated_best_and_last.format(
            best_kernel_code=kernels[best_idx],
            last_kernel_code=kernels[last_idx],
        )

    last_res = _as_result(eval_result.get(last_idx, {}))

    # --- exactly one feedback block, by priority ---

    # 1. compiler errors (utils.py:378-392)
    if (
        Strategy.COMPILER_FEEDBACK in strategy
        and _feedback_metadata(last_res) != {}
        and last_res.compiled is False
    ):
        metadata = _feedback_metadata(last_res)
        key = next(iter(metadata))
        prompt += pack.compiler_feedback.format(
            compiler_feedback=f"{key}: {metadata[key]}"
        )
        return prompt + pack.reflection_compiler_instruction

    # 2. correctness failures (utils.py:397-413)
    if (
        Strategy.CORRECTNESS_FEEDBACK in strategy
        and _feedback_metadata(last_res) != {}
        and last_res.compiled is True
        and last_res.correctness is False
    ):
        metadata = _feedback_metadata(last_res)
        issue = metadata.get("correctness_issue", "")
        if issue == "":
            issue = metadata.get("runtime_error", "")
        prompt += pack.correctness_feedback.format(correctness_feedback=f"{issue}")
        return prompt + pack.reflection_correctness_instruction

    # 3. profiler tables (utils.py:419-457)
    if Strategy.PROFILER_FEEDBACK in strategy:
        if best_idx is not None and profiler_result.get(best_idx, "") != "":
            prompt += pack.profiler_feedback.format(
                kernel="best",
                profiler_feedback=profiler_result[best_idx][:max_profiler_chars],
                runtime_ms=_as_result(eval_result[best_idx]).runtime,
            )

        include_last_profile = (
            last_idx != best_idx and profiler_result.get(last_idx, "") != ""
        )
        if context_mode == "best_and_last":
            # only when the last kernel was strictly slower than the best —
            # otherwise the last kernel IS the best kernel (utils.py:436-447)
            include_last_profile = (
                include_last_profile
                and best_idx is not None
                and last_res.runtime > _as_result(eval_result[best_idx]).runtime
            )
        if include_last_profile:
            prompt += pack.profiler_feedback.format(
                kernel="previous",
                profiler_feedback=profiler_result[last_idx][:max_profiler_chars],
                runtime_ms=last_res.runtime,
            )
        return prompt + pack.reflection_profiler_instruction

    # 4. no feedback applies: plain reflection (utils.py:460-461)
    return prompt + pack.reflection_instruction
