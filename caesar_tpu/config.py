"""Run configuration: the entire flag surface of the framework.

Replaces the reference's pydra-based CaesarRunConfig (caesar_config.py:6-99)
with a dependency-free dataclass config system that keeps the same ergonomics:

* declarative defaults with REQUIRED markers,
* CLI ``key=value`` overrides (values parsed as Python literals when possible),
* dotted sub-config overrides (``engine.quant=int8``),
* named presets applied with ``.preset`` arguments,
* a ``finalize()`` hook (parses prompt_strategy names into Strategy enums),
* full serialization next to every trajectory so runs are self-describing
  (reference logger.py:41-45).

Knobs the reference's scripts used but never wired into config (``mock``,
``use_last_only``, ``context_strategy`` — SURVEY.md §5.6) are first-class here:
``backend=mock`` and ``context_mode=last_only``.
"""

from __future__ import annotations

import ast
import copy
import dataclasses
import os
from typing import Any, List, Optional

from caesar_tpu.harness.strategy import Strategy, parse_strategies


class _Required:
    def __repr__(self) -> str:
        return "<REQUIRED>"


REQUIRED: Any = _Required()


def _parse_value(text: str) -> Any:
    """Parse a CLI value: Python literal if possible, else raw string."""
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        return text


@dataclasses.dataclass
class EngineConfig:
    """Serving-engine knobs (the data plane)."""

    #: model preset name (see caesar_tpu.engine.model.MODEL_PRESETS) or a path
    #: to a HF checkpoint directory with config.json + *.safetensors
    model: str = "qwen2.5-coder-1.5b"
    #: weight quantization: bf16 | int8 | w8a8 (int8 weights + runtime
    #: int8 activations, native int8 MXU) | int4 | w4a8 (int4 weights +
    #: runtime int8 activations — int4's HBM halving at w8a8's MXU rate)
    quant: str = "bf16"
    #: weight-scale group size: -1 auto (w8a8 -> per-column, weight-only ->
    #: 128), 0 per-column, else tokens per scale group
    #: (engine/weights.py:resolve_quant_group)
    quant_group: int = -1
    #: KV-cache storage dtype: bf16 | fp8
    kv_quant: str = "bf16"
    #: paged KV cache page size (tokens per page)
    page_size: int = 64
    #: max pages in the KV pool (0 = size automatically from HBM budget)
    num_pages: int = 0
    #: max concurrent sequences in a decode batch
    max_batch: int = 16
    #: max model sequence length served
    max_seq_len: int = 4096
    #: prefill chunk size (tokens per scheduler prefill step)
    prefill_chunk: int = 512
    #: max sequences prefilled per dispatch (rows of one batched prefill
    #: step share the weight stream, so P pending prefills cost barely more
    #: than one; row counts bucket to powers of two — one compile each).
    #: MEASURED (round 5, level-2 trajectory sweep): raising this to the
    #: budget cap (6 rows at 7B) REGRESSED the sweep 10.85x -> 9.17x —
    #: prefill at batched M is MXU-compute-bound, so the bucket's padded
    #: rows burn real compute (429 vs 251 ms/dispatch), and prefix-cache
    #: hits make real rows short (332 real tokens/dispatch).  Amortizing
    #: ragged tails needs token-packing (multiple tails in one row with
    #: block-diagonal attention), not wider buckets.
    prefill_batch: int = 4
    #: max TOKENS of prefill in flight on the device across queued
    #: dispatches (0 = derive from the HBM left after weights + KV pool).
    #: This is the admission bound that keeps prefill activation temps
    #: inside HBM: round 3 shipped nothing bounding it and the 7B config-3
    #: bench (4 rows x 1536 tokens -> ~930 MB f32 gate_up temps per
    #: matmul) OOM'd at compile.  The scheduler dispatches at most
    #: budget // prefill_inflight tokens per step and syncs past that
    #: depth (PJRT allocates queued programs' temps at enqueue).
    prefill_token_budget: int = 0
    #: async prefill dispatches kept in flight before syncing (each holds
    #: its temp buffers from enqueue until completion)
    prefill_inflight: int = 2
    #: defer a PARTIAL batch of fresh prefill rows by exactly ONE
    #: scheduler pass (i.e. one decode chunk) to wait for co-riders.
    #: Prefill cost is dominated by the per-dispatch weight stream + fixed
    #: work, so a 1-row dispatch costs nearly as much as a full
    #: prefill_batch; when trajectory turns trickle in mid-sweep this
    #: coalesces them into full rows at a worst-case cost of one decode
    #: chunk of time-to-first-token.
    prefill_coalesce: bool = True
    #: tensor-parallel size (chips); 1 on a single chip
    tp: int = 1
    #: data-parallel replicas (across remaining chips)
    dp: int = 1
    # --- multi-host (BASELINE config 5): every host runs the same engine
    # service; jax.distributed joins them into one process group over DCN.
    # tp stays within a host (ICI), dp replicas span hosts, and the harness
    # driver routes trajectories across hosts via peer_addresses (HTTP).
    #: coordinator "host:port" for jax.distributed (empty = single host,
    #: or cluster auto-detection when num_hosts > 1)
    coordinator_address: str = ""
    #: total engine-service host processes in the group (1 = single host)
    num_hosts: int = 1
    #: this process's id in the group (-1 = auto / cluster-detected)
    host_id: int = -1
    #: OpenAI-compatible endpoints of PEER hosts' engine servers
    #: ("host:port" strings) — the driver-side DCN control plane
    peer_addresses: List[str] = dataclasses.field(default_factory=list)
    #: enable cross-turn/cross-sample prefix KV reuse
    prefix_cache: bool = True
    #: admit+prefill pending requests before decoding (throughput-first;
    #: False interleaves for lower time-to-first-token)
    prefill_priority: bool = True
    #: random-init weights when no checkpoint is available (zero-egress envs)
    allow_random_init: bool = True
    #: seed for random-init weights and sampling
    seed: int = 0
    #: decode micro-batches under tensor parallelism (>1 pipelines batch
    #: slices through the layer stack so row-parallel all-reduces of one
    #: slice overlap the next slice's matmuls; numerics are unchanged).
    #: Ignored when tp == 1 or the batch does not divide evenly.
    decode_microbatches: int = 2
    #: decode dispatch pipeline depth: chunks kept in flight on the device
    #: before fetching results.  >1 chains decode chunks from the DEVICE
    #: state (no host round-trip between chunks) so the token fetch of chunk
    #: k overlaps chunk k+1's compute — hides dispatch/fetch latency at a
    #: cost of up to (depth-1) chunks of admission latency for new requests.
    #: 1 = fetch every chunk (lowest time-to-first-token).
    decode_pipeline: int = 2


@dataclasses.dataclass
class RunConfig:
    """Top-level run config (the control plane + engine)."""

    # --- run identity (reference caesar_config.py:9-10) ---
    run_group: str = REQUIRED
    run_name: str = REQUIRED

    # --- dataset (reference caesar_config.py:13-17) ---
    dataset_name: str = "kernelbench-tpu/level1"
    num_samples: int = 1  # independent chains per problem (parallel scaling)
    max_k: int = 10  # turns per trajectory

    # --- generation backend ---
    #: mock | engine | http  (the reference only had remote HTTP providers;
    #: `engine` is the in-house TPU serving engine, `mock` the deterministic
    #: no-LLM dry-run the reference scripts implied via mock=True)
    backend: str = "mock"
    model_name: str = "qwen2.5-coder-1.5b"
    server_address: Optional[str] = None  # http backend only
    server_port: Optional[int] = None

    # --- decoding parameters (reference caesar_config.py:26-30) ---
    greedy_sample: bool = False
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 50
    max_tokens: int = 4096

    # --- reasoning-model knobs (reference caesar_config.py:32-35) ---
    reasoning_model: bool = False
    reasoning_effort: str = ""
    reasoning_budget_tokens: int = 0

    # --- prompt strategy (reference caesar_config.py:38) ---
    prompt_strategy: Any = REQUIRED  # list[str] on CLI -> set[Strategy]
    #: which kernel language the prompts ask for: pallas | cuda
    prompt_flavor: str = "pallas"
    #: context composition: best_and_last (reference behavior) | last_only
    context_mode: str = "best_and_last"
    #: character cap on profiler feedback injected into prompts
    #: (reference state_machine.py:214 hard-codes 4000)
    max_profiler_feedback_chars: int = 4000

    # --- concurrency ---
    #: concurrent trajectory tasks (the reference's num_workers process pool,
    #: main.py:192-203, becomes asyncio tasks multiplexed on one engine)
    num_workers: int = 16
    #: concurrent kernel-eval slots (host CPU processes)
    eval_workers: int = 2
    #: 0 = run the full (problem x sample) sweep; N > 0 truncates the work
    #: list to its first N trajectories (benchmark legs, see
    #: tools/bench_harness.py — not a sweep-semantics knob)
    limit_trajectories: int = 0

    # --- eval sandbox ---
    #: mock | jax | torch_cpu
    eval_backend: str = "jax"
    #: keep eval_workers WARM runner subprocesses instead of one spawn per
    #: op — the per-op Python+JAX import (~2.5 s) otherwise dominates every
    #: eval on small problems (timeout semantics unchanged: exact-child
    #: kill + respawn; see evalkit/sandbox._PoolWorker)
    eval_pool: bool = True
    measure_performance: bool = True
    num_correct_trials: int = 5
    num_perf_trials: int = 100
    timeout: float = 600.0  # per compile/eval round, seconds
    #: profiler round timeout — the reference waited forever
    #: (state_machine.py:422); bounded here deliberately (SURVEY.md §7.4)
    profiler_timeout: float = 600.0

    # --- persistence (reference caesar_config.py:55-56) ---
    log_dir_prefix: str = "runs/logs"
    build_dir_prefix: str = "runs/build"

    # --- verbosity (reference caesar_config.py:58-60) ---
    verbose: bool = False
    show_state: bool = False

    # --- workflow topology ---
    transition: str = "full_feedback"

    # --- engine sub-config ---
    engine: EngineConfig = dataclasses.field(default_factory=EngineConfig)

    # ------------------------------------------------------------------
    def finalize(self) -> "RunConfig":
        """Validate and normalize; mirrors reference finalize()
        (caesar_config.py:62-71)."""
        missing = [
            f.name
            for f in dataclasses.fields(self)
            if getattr(self, f.name) is REQUIRED
        ]
        if missing:
            raise ValueError(f"Missing required config fields: {missing}")

        if not isinstance(self.prompt_strategy, (list, tuple, set, frozenset)):
            raise ValueError("'prompt_strategy' must be a list of strategy names")
        self.prompt_strategy = parse_strategies(self.prompt_strategy)

        if self.context_mode not in ("best_and_last", "last_only"):
            raise ValueError(f"Bad context_mode {self.context_mode!r}")
        if self.backend not in ("mock", "engine", "http"):
            raise ValueError(f"Bad backend {self.backend!r}")
        if self.eval_backend not in ("mock", "jax", "torch_cpu"):
            raise ValueError(f"Bad eval_backend {self.eval_backend!r}")
        if self.engine.quant not in ("bf16", "int8", "w8a8", "int4", "w4a8"):
            raise ValueError(f"Bad engine.quant {self.engine.quant!r}")
        if self.engine.kv_quant not in ("bf16", "fp8", "f32"):
            raise ValueError(f"Bad engine.kv_quant {self.engine.kv_quant!r}")
        return self

    # ------------------------------------------------------------------
    def to_dict(self) -> dict:
        def conv(v: Any) -> Any:
            if isinstance(v, (set, frozenset)):
                return sorted(str(x) for x in v)
            if isinstance(v, Strategy):
                return v.name
            if dataclasses.is_dataclass(v) and not isinstance(v, type):
                return {f.name: conv(getattr(v, f.name)) for f in dataclasses.fields(v)}
            if v is REQUIRED:
                return None
            return v

        return {
            f.name: conv(getattr(self, f.name)) for f in dataclasses.fields(self)
        }

    def copy(self) -> "RunConfig":
        return copy.deepcopy(self)

    # ------------------------------------------------------------------
    def apply_override(self, key: str, value: Any) -> None:
        """Apply one dotted ``key=value`` override."""
        obj: Any = self
        parts = key.split(".")
        for part in parts[:-1]:
            if not hasattr(obj, part):
                raise AttributeError(f"Unknown config section {part!r} in {key!r}")
            obj = getattr(obj, part)
        leaf = parts[-1]
        if not hasattr(obj, leaf):
            raise AttributeError(f"Unknown config key {key!r}")
        current = getattr(obj, leaf)
        if current is not REQUIRED and current is not None and not isinstance(
            value, type(current)
        ):
            # light coercion so `num_workers=8` (int) fits float fields etc.
            try:
                if isinstance(current, bool):
                    value = value if isinstance(value, bool) else str(value).lower() in (
                        "1",
                        "true",
                        "yes",
                    )
                elif isinstance(current, float) and isinstance(value, int):
                    value = float(value)
            except Exception:
                pass
        setattr(obj, leaf, value)

    def apply_preset(self, name: str) -> None:
        preset = PRESETS.get(name)
        if preset is None:
            raise KeyError(f"Unknown preset {name!r}; available: {sorted(PRESETS)}")
        for k, v in preset.items():
            self.apply_override(k, v)

    @classmethod
    def from_cli(cls, argv: List[str]) -> "RunConfig":
        """Build a config from CLI args: ``.preset`` then ``key=value``."""
        cfg = cls()
        for arg in argv:
            if arg.startswith("."):
                cfg.apply_preset(arg[1:])
            elif "=" in arg:
                key, _, raw = arg.partition("=")
                cfg.apply_override(key, _parse_value(raw))
            else:
                raise ValueError(f"Cannot parse CLI arg {arg!r} (want key=value)")
        return cfg.finalize()


#: Named presets (the reference kept these as comments, caesar_config.py:73-96;
#: here they are applicable with e.g. ``.mock`` on the CLI). The staged presets
#: correspond to BASELINE.json's five milestone configs.
PRESETS: dict = {
    # BASELINE.json config 1: mock CPU-only smoke run
    "mock": {
        "backend": "mock",
        "eval_backend": "mock",
        "dataset_name": "kernelbench-tpu/level1-test",
        "max_k": 1,
        "num_samples": 1,
        "greedy_sample": True,
        "prompt_strategy": ["SHOW_INLINE_SYNTAX", "COMPILER_FEEDBACK",
                            "CORRECTNESS_FEEDBACK", "PROFILER_FEEDBACK"],
    },
    # BASELINE.json config 2: 1.5B BF16 single chip greedy
    "bf16-1.5b": {
        "backend": "engine",
        "engine.model": "qwen2.5-coder-1.5b",
        "engine.quant": "bf16",
        "greedy_sample": True,
        "max_k": 3,
        "dataset_name": "kernelbench-tpu/level1-subset",
    },
    # BASELINE.json config 3: 7B INT8 continuous batching, 48 trajectories
    "int8-7b": {
        "backend": "engine",
        "engine.model": "qwen2.5-coder-7b",
        "engine.quant": "int8",
        "engine.max_batch": 48,
        "num_workers": 48,
    },
    # BASELINE.json config 4: 32B INT4 + FP8 KV, 8-chip TP, last-only context
    "int4-32b": {
        "backend": "engine",
        "engine.model": "r1-distill-32b",
        "engine.quant": "int4",
        "engine.kv_quant": "fp8",
        "engine.tp": 8,
        "context_mode": "last_only",
    },
    # BASELINE.json config 5: 70B-class multi-host sweep
    "70b-pod": {
        "backend": "engine",
        "engine.model": "llama-70b",
        "engine.quant": "int4",
        "engine.kv_quant": "fp8",
        "engine.tp": 8,
        "engine.dp": 2,
        "dataset_name": "kernelbench-tpu/level2",
        "max_k": 10,
        "num_samples": 10,
        "temperature": 0.7,
    },
}


def default_test_config(**overrides: Any) -> RunConfig:
    """A finalized config for tests: mock everything, tmp-friendly dirs."""
    cfg = RunConfig()
    cfg.run_group = "test_group"
    cfg.run_name = "test_run"
    cfg.prompt_strategy = [
        "SHOW_INLINE_SYNTAX",
        "COMPILER_FEEDBACK",
        "CORRECTNESS_FEEDBACK",
        "PROFILER_FEEDBACK",
    ]
    cfg.backend = "mock"
    cfg.eval_backend = "mock"
    cfg.max_k = 2
    for k, v in overrides.items():
        cfg.apply_override(k, v)
    return cfg.finalize()
