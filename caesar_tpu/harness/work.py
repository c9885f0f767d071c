"""Identity of one trajectory: (problem, sample).

Equivalent of the reference's WorkArgs (work.py:5-16); determines the
journal/build directory layout (problem_<id>/sample_<id>).
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class WorkItem:
    problem_id: int
    sample_id: int
    problem_path: str

    def log_path(self) -> str:
        return os.path.join(f"problem_{self.problem_id}", f"sample_{self.sample_id}")
