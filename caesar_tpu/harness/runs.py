"""Run-tree inspection: census and navigation over the journal directory.

Equivalent of the reference's run-information utils (utils.py:87-244),
shared by the viewer and analysis: enumerate run groups / runs / problems,
count DONE sentinels, and summarize per-turn trajectories.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path
from typing import Dict, List, Optional


def _subdirs(path: Path) -> List[str]:
    try:
        return sorted(d for d in os.listdir(path) if (path / d).is_dir())
    except OSError:
        return []


def get_run_groups(base_dir: str | os.PathLike) -> List[str]:
    return _subdirs(Path(base_dir))


def get_runs(base_dir: str | os.PathLike, run_group: str) -> List[str]:
    return _subdirs(Path(base_dir) / run_group)


def get_problem_ids(
    base_dir: str | os.PathLike, run_group: str, run_name: str
) -> List[int]:
    out = []
    for d in _subdirs(Path(base_dir) / run_group / run_name):
        m = re.search(r"\d+", d)
        if m:
            out.append(int(m.group()))
    return sorted(out)


def get_sample_ids(
    base_dir: str | os.PathLike, run_group: str, run_name: str, problem_id: int
) -> List[int]:
    out = []
    for d in _subdirs(Path(base_dir) / run_group / run_name / f"problem_{problem_id}"):
        m = re.search(r"\d+", d)
        if m:
            out.append(int(m.group()))
    return sorted(out)


def get_finished_counts(base_dir: str | os.PathLike, run_group: str) -> Dict[str, dict]:
    """Per-run finished/attempted census by counting DONE files
    (reference get_run_group_finished_runs, utils.py:141-167)."""
    stats: Dict[str, dict] = {}
    group_path = Path(base_dir) / run_group
    for run_name in _subdirs(group_path):
        finished = attempted = 0
        run_path = group_path / run_name
        for problem in _subdirs(run_path):
            problem_path = run_path / problem
            for sample in _subdirs(problem_path):
                attempted += 1
                if (problem_path / sample / "DONE").exists():
                    finished += 1
        stats[run_name] = {"finished": finished, "attempted": attempted}
    return stats


def sample_dir(
    base_dir: str | os.PathLike,
    run_group: str,
    run_name: str,
    problem_id: int,
    sample_id: int,
) -> Path:
    return (
        Path(base_dir)
        / run_group
        / run_name
        / f"problem_{problem_id}"
        / f"sample_{sample_id}"
    )


def load_log(sample_path: Path) -> Optional[dict]:
    path = sample_path / "log.json"
    if not path.exists():
        return None
    try:
        return json.loads(path.read_text())
    except json.JSONDecodeError:
        return None


def load_config(sample_path: Path) -> Optional[dict]:
    path = sample_path / "config.json"
    if not path.exists():
        return None
    try:
        return json.loads(path.read_text())
    except json.JSONDecodeError:
        return None


def turn_trajectories(log: dict, max_turns: int):
    """(compiled, correct, runtime) trajectories over turns — None where a
    turn has no eval (reference get_turn_trajectory_overviews,
    utils.py:190-214)."""
    compiled, correct, runtime = [], [], []
    for turn in range(1, max_turns + 1):
        data = log.get(str(turn)) or log.get(turn) or {}
        ev = data.get("eval_result")
        if not isinstance(ev, dict) or not ev:
            compiled.append(None)
            correct.append(None)
            runtime.append(None)
        else:
            compiled.append(ev.get("compiled"))
            correct.append(ev.get("correctness"))
            runtime.append(ev.get("runtime", -1))
    return compiled, correct, runtime


def prev_problem_id(available: List[int], current: int) -> int:
    idx = available.index(int(current))
    return available[idx - 1] if idx > 0 else int(current)


def next_problem_id(available: List[int], current: int) -> int:
    idx = available.index(int(current))
    return available[idx + 1] if idx < len(available) - 1 else int(current)
