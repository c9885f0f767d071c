"""The TPU-native serving engine: the data plane behind GENERATE.

Replaces the reference's external LLM providers (query_server,
state_machine.py:226-248) with an in-house JAX/XLA/Pallas engine:

    model.py        — Qwen2/Llama-family decoder (functional JAX, bf16)
    weights.py      — random-init / HF-safetensors weight loading
    tokenizer.py    — byte-fallback tokenizer (HF tokenizer.json when present)
    kvcache.py      — paged KV cache (bf16 or FP8 storage)
    sampling.py     — greedy / temperature / top-k / top-p in-jit sampling
    quant.py        — INT8/INT4 weight-only quantization
    engine.py       — continuous-batching serving core + async generate()
    prefix.py       — cross-turn/cross-sample prefix (KV page) reuse
    service.py      — EngineGenerator adapter for the harness
"""
