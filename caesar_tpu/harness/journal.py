"""Crash-safe per-turn journal: the trajectory's checkpoint.

Equivalent of the reference's CaesarLogger (logger.py:14-113) and DONE
protocol (state_machine.py:70-75, 463-464): one directory per
(problem, sample) holding config.json (written at init, so runs are
self-describing), log.json keyed by turn number, and an empty DONE sentinel
on completion.  The journal is written at the end of every turn — the
atomicity unit for recovery is the turn.

Deliberate fixes over the reference (SURVEY.md §7.4):

* log.json is written atomically (tmp file + os.replace) so a kill mid-write
  can never leave a truncated JSON behind — the reference wrote in place.
* token_usage is gated on token_usage, not on model_response
  (reference logger.py:94 copy-paste bug dropped usage whenever the response
  was empty).
* eval results keep one canonical type (KernelExecResult) through the
  save/load round-trip.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

from caesar_tpu.evalkit.result import KernelExecResult
from caesar_tpu.harness.turn_info import TrajectoryInfo, TurnRecord


def _json_default(obj: object) -> object:
    if isinstance(obj, KernelExecResult):
        return obj.to_dict()
    if hasattr(obj, "to_dict"):
        return obj.to_dict()  # type: ignore[union-attr]
    if hasattr(obj, "__dict__"):
        return obj.__dict__
    return str(obj)


def atomic_write_json(path: Path, payload: object) -> None:
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2, default=_json_default)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class TurnJournal:
    """Journal for a single trajectory (one problem, one sample)."""

    def __init__(
        self,
        log_dir: str | os.PathLike,
        config_dict: Optional[dict] = None,
        log_name: str = "log.json",
        verbose: bool = False,
    ):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.log_file = self.log_dir / log_name
        self.config_file = self.log_dir / "config.json"
        self.done_file = self.log_dir / "DONE"
        self.verbose = verbose

        #: dict[int, dict] — on-disk-shaped view of the turns written so far
        self.current_log: dict = {}

        if config_dict is not None:
            atomic_write_json(self.config_file, config_dict)

    # ------------------------------------------------------------------
    def save(self) -> None:
        payload = {
            str(turn): (
                rec.to_dict() if isinstance(rec, TurnRecord) else rec
            )
            for turn, rec in self.current_log.items()
        }
        atomic_write_json(self.log_file, payload)
        if self.verbose:
            print(f"[JOURNAL] saved {self.log_file}")

    def load(self) -> None:
        """Load log.json if present; turn keys become ints and eval dicts
        rehydrate into KernelExecResult (reference logger.py:54-71)."""
        if not self.log_file.exists():
            return
        with open(self.log_file, "r") as f:
            raw = json.load(f)
        self.current_log = {}
        for key, turn_data in raw.items():
            if not str(key).lstrip("-").isdigit():
                continue
            if isinstance(turn_data, dict) and "eval_result" in turn_data:
                turn_data["eval_result"] = KernelExecResult.from_dict(
                    turn_data["eval_result"]
                )
            self.current_log[int(key)] = turn_data

    def clean(self) -> None:
        """Drop in-memory log state without touching the file
        (reference logger.py:73-77)."""
        self.current_log.clear()

    # ------------------------------------------------------------------
    def update_turn(self, turn: int, info: TrajectoryInfo) -> None:
        """Field-wise merge of turn `turn` from the trajectory info
        (reference logger.py:79-101 semantics: only non-empty values
        overwrite)."""
        slot = self.current_log.setdefault(
            turn,
            {
                "prompt": "",
                "model_response": "",
                "token_usage": {},
                "kernel_code": "",
                "eval_result": {},
                "profiler_result": "",
            },
        )
        rec = info.turns.get(turn)
        if rec is None:
            return
        if rec.prompt:
            slot["prompt"] = rec.prompt
        if rec.model_response:
            slot["model_response"] = rec.model_response
        if rec.token_usage:  # fixed: reference gated this on model_response
            slot["token_usage"] = rec.token_usage
        if rec.kernel_code:
            slot["kernel_code"] = rec.kernel_code
        if rec.eval_result:
            slot["eval_result"] = rec.eval_result
        if rec.profiler_result:
            slot["profiler_result"] = rec.profiler_result

    def update_turn_and_save(self, turn: int, info: TrajectoryInfo) -> None:
        self.update_turn(turn, info)
        self.save()

    # ------------------------------------------------------------------
    def is_done(self) -> bool:
        return self.done_file.exists()

    def mark_done(self) -> None:
        with open(self.done_file, "w"):
            pass
