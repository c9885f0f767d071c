"""Decoder-only transformer (Qwen2/Llama family) in functional JAX.

Design notes (TPU-first):

* Pure functions over a params pytree — no framework modules.  Everything
  composes with jit / shard_map / quantization rewrites.
* bf16 weights and activations; f32 accumulation in matmuls and softmax
  (preferred_element_type) so the MXU runs at full rate without f32 cost.
* GQA: n_kv_heads <= n_heads; K/V computed per kv-head and broadcast to the
  query-head groups inside attention.
* RoPE in f32 for numerical parity with reference implementations.
* Static shapes only: prefill takes a fixed [B, T] chunk, decode a fixed
  [B, 1]; sequence-length variation is masking, never shape change, so XLA
  compiles each step exactly once.

The linear layers route through `linear()` which dispatches on the weight
leaf type — a plain bf16 array or a QuantizedLinear (engine/quant.py) with a
fused dequant matmul — so the same model code serves bf16, INT8, and INT4.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from caesar_tpu.engine import quant as quant_lib


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    vocab: int
    dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    hidden: int  # MLP intermediate size
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    attn_bias: bool = True  # Qwen2 uses q/k/v biases; Llama does not
    tie_embeddings: bool = False

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim

    def param_bytes(self, bytes_per_weight: float = 2.0) -> int:
        per_layer = (
            self.dim * (self.q_dim + 2 * self.kv_dim)  # qkv
            + self.q_dim * self.dim  # o
            + 3 * self.dim * self.hidden  # gate/up/down
        )
        embed = self.vocab * self.dim * (1 if self.tie_embeddings else 2)
        return int((per_layer * self.n_layers + embed) * bytes_per_weight)


#: Public architecture shapes (from the models' published configs).
MODEL_PRESETS: Dict[str, ModelSpec] = {
    "tiny": ModelSpec(  # test-only
        "tiny", vocab=512, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        head_dim=16, hidden=128, rope_theta=1e4, tie_embeddings=True,
    ),
    "qwen2.5-coder-0.5b": ModelSpec(
        "qwen2.5-coder-0.5b", vocab=151936, dim=896, n_layers=24, n_heads=14,
        n_kv_heads=2, head_dim=64, hidden=4864, tie_embeddings=True,
    ),
    "qwen2.5-coder-1.5b": ModelSpec(
        "qwen2.5-coder-1.5b", vocab=151936, dim=1536, n_layers=28, n_heads=12,
        n_kv_heads=2, head_dim=128, hidden=8960, tie_embeddings=True,
    ),
    "qwen2.5-coder-7b": ModelSpec(
        "qwen2.5-coder-7b", vocab=152064, dim=3584, n_layers=28, n_heads=28,
        n_kv_heads=4, head_dim=128, hidden=18944,
    ),
    "r1-distill-32b": ModelSpec(  # DeepSeek-R1-Distill-Qwen-32B
        "r1-distill-32b", vocab=152064, dim=5120, n_layers=64, n_heads=40,
        n_kv_heads=8, head_dim=128, hidden=27648,
    ),
    "llama-70b": ModelSpec(
        "llama-70b", vocab=128256, dim=8192, n_layers=80, n_heads=64,
        n_kv_heads=8, head_dim=128, hidden=28672, rope_theta=5e5,
        attn_bias=False,
    ),
}


def get_spec(name: str) -> ModelSpec:
    try:
        return MODEL_PRESETS[name]
    except KeyError:
        raise KeyError(
            f"Unknown model preset {name!r}; available: {sorted(MODEL_PRESETS)}"
        ) from None


# ----------------------------------------------------------------------
# primitives
# ----------------------------------------------------------------------


def linear(
    x: jax.Array,
    w: Any,
    bias: Optional[jax.Array] = None,
    tp_axis: Optional[str] = None,
) -> jax.Array:
    """x @ w with f32 accumulation; dispatches on quantized weights.

    tp_axis: set by ROW-PARALLEL call sites inside shard_map (wo, mlp down —
    the caller psums the partial output afterwards).  Only w8a8 consumes it:
    the per-token activation scale syncs over the axis so sharded numerics
    match single-device exactly.  Row-parallel weights carry no bias (a
    per-shard bias would be multiplied by tp in the psum)."""
    if isinstance(w, quant_lib.QuantizedLinear):
        # bias-free sites let the kernel emit the activation dtype directly
        # (fused per-token rescale + bf16 out tile — half the [M, N] HBM
        # traffic of the fattest decode intermediates); biased sites keep
        # the f32 output so the bias add stays in f32
        y = quant_lib.quantized_matmul(
            x, w, tp_axis=tp_axis,
            out_dtype=x.dtype if bias is None else None,
        )
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if bias is not None:
        assert tp_axis is None, "row-parallel linear must not carry a bias"
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (xf * scale * weight.astype(jnp.float32)).astype(x.dtype)


def rope_tables(
    positions: jax.Array, head_dim: int, theta: float
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables [.., head_dim/2] in f32 for the given positions."""
    half = head_dim // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [..., half]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate [..., n_heads, head_dim] by position tables [..., half].

    Split-half convention (x1 = first half, x2 = second half) — the same
    layout HF Qwen2/Llama checkpoints use, so loaded weights match.
    """
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    c = cos[..., None, :]  # broadcast over heads
    s = sin[..., None, :]
    out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.astype(x.dtype)


# ----------------------------------------------------------------------
# attention (cacheless path, used for parity tests and scoring)
# ----------------------------------------------------------------------


def attention_full(
    q: jax.Array,  # [B, T, n_heads, hd]
    k: jax.Array,  # [B, S, n_kv, hd]
    v: jax.Array,  # [B, S, n_kv, hd]
    causal_offset: int = 0,
) -> jax.Array:
    """Dense causal attention with GQA broadcast; f32 softmax."""
    b, t, n_heads, hd = q.shape
    _, s, n_kv, _ = k.shape
    groups = n_heads // n_kv

    qg = q.reshape(b, t, n_kv, groups, hd)
    scores = jnp.einsum(
        "btkgh,bskh->bkgts", qg, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(hd))

    q_pos = jnp.arange(t)[:, None] + causal_offset
    k_pos = jnp.arange(s)[None, :]
    mask = q_pos >= k_pos  # [t, s]
    scores = jnp.where(mask[None, None, None], scores, -jnp.inf)

    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgts,bskh->btkgh", probs, v)
    return out.reshape(b, t, n_heads, hd)


# ----------------------------------------------------------------------
# blocks
# ----------------------------------------------------------------------


def mlp(params: dict, x: jax.Array, tp_axis: Optional[str] = None) -> jax.Array:
    """tp_axis: the down projection is row-parallel under TP; the caller
    psums the returned partial outside."""
    if quant_lib._use_pallas() and os.environ.get("CAESAR_FUSED_MLP"):
        # OPT-IN (round 5, measured): the fused gate_up + SiLU kernel
        # (ops/mlp_fused.py) removes the f32 intermediate's HBM round
        # trips, but a clean same-process A/B measured it NEUTRAL
        # (+0.03 ms/step at 7B B=48) — XLA already fuses the glue chain
        # into ~one pass at this batch.  Kept opt-in for larger decode
        # batches (TP shards, bigger M) where the intermediate is fatter.
        from caesar_tpu.ops import mlp_fused

        leading = x.shape[:-1]
        m_total = 1
        for d in leading:
            m_total *= d
        ok, _ = mlp_fused.supports(params, m_total)
        if ok:
            h = mlp_fused.gateup_silu(
                params, x.reshape(m_total, x.shape[-1]), tp_axis
            )
            h = h.reshape(*leading, h.shape[-1])
            return linear(h, params["down"], tp_axis=tp_axis)
    if "gate_up" in params:  # fused layout (quant.fuse_params)
        gu = linear(x, params["gate_up"])
        hidden = gu.shape[-1] // 2
        gate, up = gu[..., :hidden], gu[..., hidden:]
    else:
        gate = linear(x, params["gate"])
        up = linear(x, params["up"])
    return linear(jax.nn.silu(gate) * up, params["down"], tp_axis=tp_axis)


def qkv_project(
    spec: ModelSpec, layer: dict, x: jax.Array, positions: jax.Array,
    rope: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Project + RoPE.  x: [B, T, D] -> q [B,T,H,hd], k/v [B,T,KV,hd].

    Supports both the canonical per-projection layout (wq/wk/wv — used when
    tensor-parallel sharding needs head-aligned splits) and the fused single
    "wqkv" layout (one [D, q_dim+2*kv_dim] matmul — fewer, bigger kernel
    launches for single-device serving; see quant.fuse_params).

    rope: precomputed (cos, sin) tables for `positions` — the decode step
    hoists them out of the layer loop (positions are identical across all
    n_layers calls within one step)."""
    b, t, _ = x.shape
    if "wqkv" in layer:
        qkv = linear(x, layer["wqkv"], layer.get("bqkv"))
        q = qkv[..., : spec.q_dim].reshape(b, t, spec.n_heads, spec.head_dim)
        k = qkv[..., spec.q_dim : spec.q_dim + spec.kv_dim].reshape(
            b, t, spec.n_kv_heads, spec.head_dim
        )
        v = qkv[..., spec.q_dim + spec.kv_dim :].reshape(
            b, t, spec.n_kv_heads, spec.head_dim
        )
    else:
        q = linear(x, layer["wq"], layer.get("bq")).reshape(
            b, t, spec.n_heads, spec.head_dim
        )
        k = linear(x, layer["wk"], layer.get("bk")).reshape(
            b, t, spec.n_kv_heads, spec.head_dim
        )
        v = linear(x, layer["wv"], layer.get("bv")).reshape(
            b, t, spec.n_kv_heads, spec.head_dim
        )
    cos, sin = (
        rope if rope is not None
        else rope_tables(positions, spec.head_dim, spec.rope_theta)
    )
    return apply_rope(q, cos, sin), apply_rope(k, cos, sin), v


def block_cacheless(
    spec: ModelSpec, layer: dict, x: jax.Array, positions: jax.Array
) -> jax.Array:
    h = rms_norm(x, layer["ln_attn"], spec.rms_eps)
    q, k, v = qkv_project(spec, layer, h, positions)
    attn = attention_full(q, k, v)
    x = x + linear(attn.reshape(*x.shape[:2], spec.q_dim), layer["wo"])
    h = rms_norm(x, layer["ln_mlp"], spec.rms_eps)
    return x + mlp(layer["mlp"], h)


def forward_cacheless(
    spec: ModelSpec, params: dict, tokens: jax.Array
) -> jax.Array:
    """Full forward over [B, T] token ids -> [B, T, vocab] logits.

    The parity-test / perplexity path; serving uses the paged-cache step
    functions in engine.py.
    """
    b, t = tokens.shape
    x = params["embed"][tokens]  # activations inherit the params dtype
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    for layer in params["layers"]:
        x = block_cacheless(spec, layer, x, positions)
    x = rms_norm(x, params["ln_out"], spec.rms_eps)
    if spec.tie_embeddings:
        return jnp.dot(
            x, params["embed"].T, preferred_element_type=jnp.float32
        )
    return linear(x, params["unembed"]).astype(jnp.float32)
