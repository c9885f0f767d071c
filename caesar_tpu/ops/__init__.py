"""Pallas TPU kernels: the hand-tuned hot ops of the serving engine.

    quant_matmul.py     — fused INT8/INT4 dequant + matmul (weights stay
                          quantized until the MXU's doorstep)
    paged_attention.py  — decode attention reading KV pages from HBM
    collectives.py      — latency-optimized ring collectives (ICI)

Every kernel has an XLA fallback in the engine; kernels run in interpreter
mode in CPU tests and compiled via Mosaic on TPU.
"""
