"""Offline analysis: fast_p / fast_0 scoring over run logs."""

from caesar_tpu.analysis.fastp import (
    fastp,
    best_runtime_up_to_k,
    compute_fast_p_for_run,
    compute_fast_0_for_run,
)

__all__ = [
    "fastp",
    "best_runtime_up_to_k",
    "compute_fast_p_for_run",
    "compute_fast_0_for_run",
]
