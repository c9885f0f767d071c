"""Device peak-rate table for roofline-style profiler feedback.

Peaks are public datasheet numbers; used only to annotate profiler tables
with achieved-fraction-of-peak, which stands in the prompt seat the
reference's torch.profiler table occupied (eval.py:199-200).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DevicePeaks:
    name: str
    flops_f32: float  # FLOP/s dense f32 (or f32-accumulated bf16 path)
    flops_bf16: float  # FLOP/s dense bf16
    hbm_bw: float  # bytes/s


_PEAKS = {
    # TPU v5e (one chip): 394 TFLOPs bf16, 197 TFLOPs fp32-ish, 819 GB/s HBM
    "tpu_v5e": DevicePeaks("TPU v5e", 98.5e12, 394e12, 819e9),
    # TPU v4: 275 TFLOPs bf16, 1228 GB/s
    "tpu_v4": DevicePeaks("TPU v4", 68.75e12, 275e12, 1228e9),
    # generic host CPU fallback — rough, only to keep the table well-formed
    "cpu": DevicePeaks("host CPU", 2e11, 2e11, 5e10),
}


def peaks_for_device(device) -> DevicePeaks:
    """Map a jax.Device to its peak table (CPU fallback otherwise)."""
    kind = getattr(device, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return _PEAKS["tpu_v5e"]
    if "v4" in kind:
        return _PEAKS["tpu_v4"]
    if "tpu" in kind or getattr(device, "platform", "") == "tpu":
        return _PEAKS["tpu_v5e"]
    return _PEAKS["cpu"]
