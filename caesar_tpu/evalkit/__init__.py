"""Kernel evaluation sandboxes: compile / correctness / profile backends."""

from caesar_tpu.evalkit.result import KernelExecResult

__all__ = ["KernelExecResult"]
