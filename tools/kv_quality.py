"""KV-storage quality scorecard CLI (VERDICT r2 item 9).

Runs engine/quality.py's kv_quality_report — perplexity with K/V rounded
through each pool storage dtype vs the unrounded forward — on a real model
spec with seeded random weights (the rounding error of the storage dtype is
a property of the K/V value distribution, which random init reproduces at
the right scale; real-checkpoint deltas are re-measured whenever weights
are available, docs/ENGINE.md).

    python tools/kv_quality.py [model] [n_texts] [max_len]
    JAX_PLATFORMS=cpu python tools/kv_quality.py qwen2.5-coder-0.5b

Prints one JSON line: ppl per kv dtype + relative deltas.
"""

from __future__ import annotations

import json
import os
import sys

# CPU-only measurement: the axon sitecustomize force-registers the TPU
# plugin regardless of JAX_PLATFORMS — strip it so this tool NEVER grabs
# the (exclusive) TPU out from under a running bench/probe
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# the axon sitecustomize force-updates jax_platforms at interpreter start;
# config-level override wins as long as no backend is initialized yet
jax.config.update("jax_platforms", "cpu")


def main() -> None:
    model = sys.argv[1] if len(sys.argv) > 1 else "qwen2.5-coder-0.5b"
    n_texts = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    max_len = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    import jax.numpy as jnp

    from caesar_tpu.engine.model import get_spec
    from caesar_tpu.engine.quality import kv_quality_report, token_stream
    from caesar_tpu.engine.tokenizer import ByteTokenizer
    from caesar_tpu.engine.weights import init_params

    spec = get_spec(model)
    params = init_params(spec, seed=0, dtype=jnp.float32)
    texts = [
        f"def kernel_{i}(x):\n    # pallas tpu matmul variant {i}\n"
        + "    acc = jnp.zeros((128, 128), jnp.float32)\n" * (i % 4 + 1)
        + "    return acc\n"
        for i in range(n_texts)
    ]
    ids = token_stream(ByteTokenizer(), texts, max_len=max_len)
    report = kv_quality_report(spec, params, ids)
    print(
        json.dumps(
            {
                "metric": f"kv_quality_{model}",
                **{k: round(float(v), 6) for k, v in report.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
