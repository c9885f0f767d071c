"""Problem datasets: directories of KernelBench-style problem files.

Equivalent of the reference's KernelBenchDataset surface as used by
main.py:36-51,64-67,176-178: a dataset resolves problem ids to problem file
paths.  Problem files are named ``<id>_<Name>.py`` and define:

* ``Model`` — a callable architecture (plain JAX for the native problem set;
  a torch.nn.Module for the torch parity set),
* ``get_init_inputs()`` — constructor args for Model,
* ``get_inputs()`` — a fresh randomized list of call inputs per invocation.

The shipped TPU-native sets live in ``problems/level{1,2,3}`` at the repo
root.  Dataset name grammar (mirrors the reference's
``dataset_name_to_dataset`` map, main.py:36-51):

    kernelbench-tpu/level1          full level
    kernelbench-tpu/level1-subset   first 10 problems
    kernelbench-tpu/level1-random   10 problems, seeded shuffle
    kernelbench-tpu/level1-test     single smoke problem (softmax)
"""

from __future__ import annotations

import os
import random
import re
from pathlib import Path
from typing import Dict, List, Sequence

_PROBLEM_RE = re.compile(r"^(\d+)_(.+)\.py$")

#: repo root problems directory (resolved relative to this file)
PROBLEMS_ROOT = Path(__file__).resolve().parents[2] / "problems"

SUBSET_SIZE = 10
RANDOM_SUBSET_SEED = 42


class ProblemDataset:
    """An ordered set of (problem_id -> problem file path)."""

    def __init__(self, paths: Sequence[str | os.PathLike], name: str = "custom"):
        self.name = name
        self._by_id: Dict[int, str] = {}
        for p in paths:
            p = str(p)
            m = _PROBLEM_RE.match(os.path.basename(p))
            if not m:
                raise ValueError(
                    f"Problem file {p!r} must be named '<id>_<Name>.py'"
                )
            pid = int(m.group(1))
            if pid in self._by_id:
                raise ValueError(f"Duplicate problem id {pid} in dataset {name!r}")
            self._by_id[pid] = p

    @classmethod
    def from_dir(cls, directory: str | os.PathLike, name: str = "") -> "ProblemDataset":
        directory = Path(directory)
        paths = sorted(
            str(directory / f)
            for f in os.listdir(directory)
            if _PROBLEM_RE.match(f)
        )
        return cls(paths, name=name or str(directory))

    def get_problem_ids(self) -> List[int]:
        return sorted(self._by_id)

    def get_problem_path_by_id(self, problem_id: int) -> str:
        return self._by_id[problem_id]

    def __len__(self) -> int:
        return len(self._by_id)

    def subset(self, ids: Sequence[int], name: str = "") -> "ProblemDataset":
        return ProblemDataset(
            [self._by_id[i] for i in ids], name=name or f"{self.name}-subset"
        )


def resolve_dataset(name: str, root: str | os.PathLike | None = None) -> ProblemDataset:
    """Resolve a dataset name like ``kernelbench-tpu/level2-random``."""
    root = Path(root) if root is not None else PROBLEMS_ROOT
    m = re.match(r"^kernelbench-tpu/level(\d)(?:-(subset|random|test))?$", name)
    if not m:
        raise KeyError(
            f"Unknown dataset {name!r} (want kernelbench-tpu/level<N>[-subset|"
            f"-random|-test])"
        )
    level, variant = int(m.group(1)), m.group(2)
    level_dir = root / f"level{level}"
    if not level_dir.is_dir():
        raise KeyError(f"Unknown dataset {name!r}: no directory {level_dir}")
    base = ProblemDataset.from_dir(level_dir, name=name)

    if variant is None:
        return base
    ids = base.get_problem_ids()
    if variant == "subset":
        return base.subset(ids[:SUBSET_SIZE], name=name)
    if variant == "random":
        rng = random.Random(RANDOM_SUBSET_SEED)
        picked = sorted(rng.sample(ids, min(SUBSET_SIZE, len(ids))))
        return base.subset(picked, name=name)
    if variant == "test":
        # the single-problem smoke dataset (reference main.py:47-51 pins
        # 23_Softmax); our native level1 also ships a softmax under id 23
        pid = 23 if 23 in ids else ids[0]
        return base.subset([pid], name=name)
    raise AssertionError(variant)
