"""caesar_tpu — a TPU-native multi-turn kernel-generation framework.

A from-scratch framework with the capabilities of Caesar (alexghergh/caesar):
a per-trajectory state machine drives an LLM to iteratively generate, compile,
evaluate, and profile compute kernels, feeding execution feedback into the next
turn's prompt — run at high throughput across hundreds of problem x sample
trajectories.

Where the reference delegates generation to external LLM APIs
(state_machine.py:226-248 in the reference) and time-shares local GPUs through
a process-level semaphore (orchestrator.py), this framework provides an
in-house TPU serving engine (JAX/XLA/Pallas): quantized weights (INT8/INT4),
paged FP8-capable KV cache, continuous batching natively driving the trajectory
state machines, prefix-cache reuse across turns, and Mesh/shard_map tensor
sharding from one chip to a multi-host slice.

Layout:
    caesar_tpu.harness   — control plane: states, transitions, prompts,
                           context builder, journal, recovery, scheduler
    caesar_tpu.evalkit   — kernel eval sandboxes (mock / JAX / torch-CPU)
    caesar_tpu.engine    — TPU serving engine (model, KV cache, batching)
    caesar_tpu.ops       — Pallas TPU kernels (quant matmul, paged attention)
    caesar_tpu.parallel  — mesh/sharding plans and collective helpers
    caesar_tpu.interface — trajectory viewer (stdlib HTTP)
    caesar_tpu.analysis  — offline fast_p / fast_0 scoring
"""

__version__ = "0.1.0"
