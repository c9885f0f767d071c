"""Prompt-context strategy flags.

Same vocabulary as the reference's Strategy enum (strategy.py:8-23), used as a
set to gate which context blocks the prompt builder includes. Parsed from
config by name (reference caesar_config.py:62-71).
"""

from __future__ import annotations

import enum
from typing import Iterable, Set


class Strategy(enum.Enum):
    #: include an example (reference-architecture, hand-written-kernel) pair
    #: showing the target kernel-embedding syntax
    SHOW_INLINE_SYNTAX = "show_inline_syntax"

    #: feed compiler errors back into the next turn's prompt
    COMPILER_FEEDBACK = "use_compiler_feedback"

    #: feed correctness-check failures back into the next turn's prompt
    CORRECTNESS_FEEDBACK = "use_correctness_feedback"

    #: feed profiler tables for correct kernels into the next turn's prompt
    PROFILER_FEEDBACK = "use_profiler_feedback"

    def __str__(self) -> str:
        return self.name


def parse_strategies(names: Iterable[str]) -> Set[Strategy]:
    """Parse strategy names (e.g. from CLI) into a strategy set."""
    out: Set[Strategy] = set()
    for name in names:
        if isinstance(name, Strategy):
            out.add(name)
            continue
        key = str(name).strip().upper()
        try:
            out.add(Strategy[key])
        except KeyError:
            raise ValueError(
                f"Unknown strategy {name!r}; available: "
                f"{[s.name for s in Strategy]}"
            ) from None
    return out


#: The full-feedback default used by the shipped configs.
ALL_STRATEGIES = frozenset(Strategy)
