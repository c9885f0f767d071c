"""In-jit token sampling: greedy, temperature, top-k, top-p.

One static-shape function over a [B, vocab] logits batch — every sequence in
the continuous batch samples in the same fused kernel, with per-sequence
temperature so greedy (temperature 0) and high-temperature trajectories mix
freely in one decode step (the reference exposed exactly these knobs per
request: greedy_sample/temperature/top_p/top_k, caesar_config.py:26-30).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_tokens(
    logits: jax.Array,  # [B, vocab] f32
    rng: jax.Array,  # single PRNG key; split internally per step
    temperature: jax.Array,  # [B] — 0 means greedy
    top_k: jax.Array,  # [B] int32 — 0 disables
    top_p: jax.Array,  # [B] f32 — 1.0 disables
) -> jax.Array:
    """Returns [B] sampled token ids."""
    vocab = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1)

    # All-greedy batches skip the sort entirely: a full-vocab sort per decode
    # step (e.g. 152K logits) costs more than the rest of sampling combined,
    # and greedy (temperature 0) is the reference's default mode
    # (greedy_sample, caesar_config.py:26).  lax.cond keeps this in-jit.
    any_sampled = jnp.any(temperature > 0)
    return jax.lax.cond(
        any_sampled,
        lambda: _sample_nongreedy(logits, greedy, rng, temperature, top_k, top_p),
        lambda: greedy,
    )


def _sample_nongreedy(
    logits: jax.Array,
    greedy: jax.Array,
    rng: jax.Array,
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
) -> jax.Array:
    vocab = logits.shape[-1]
    # temperature scaling (guard 0 to avoid div-by-zero; masked out below).
    # logits may arrive bf16 (decode keeps the lm head's native dtype —
    # step._lm_head); the softmax/cumsum chain below needs f32.
    safe_t = jnp.where(temperature > 0, temperature, 1.0)
    scaled = logits.astype(jnp.float32) / safe_t[:, None]

    # top-k mask: keep the k highest logits
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]  # [B, vocab] descending
    k = jnp.clip(top_k, 0, vocab)
    kth_idx = jnp.clip(k - 1, 0, vocab - 1)
    kth_value = jnp.take_along_axis(sorted_desc, kth_idx[:, None], axis=-1)
    topk_mask = jnp.where(
        (k > 0)[:, None], scaled >= kth_value, jnp.ones_like(scaled, dtype=bool)
    )

    # top-p (nucleus) mask on the sorted distribution
    probs_desc = jax.nn.softmax(sorted_desc, axis=-1)
    cumulative = jnp.cumsum(probs_desc, axis=-1)
    # keep tokens while the cumulative mass BEFORE them is < top_p
    keep_sorted = (cumulative - probs_desc) < top_p[:, None]
    # threshold = smallest kept logit value per row
    big = jnp.finfo(scaled.dtype).max
    kept_vals = jnp.where(keep_sorted, sorted_desc, big)
    threshold = jnp.min(kept_vals, axis=-1, keepdims=True)
    topp_mask = scaled >= threshold

    masked = jnp.where(topk_mask & topp_mask, scaled, -jnp.inf)
    sampled = jax.random.categorical(rng, masked, axis=-1)

    return jnp.where(temperature > 0, sampled, greedy)
