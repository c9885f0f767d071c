"""Jitted serving steps: chunked prefill and multi-step batched decode.

The two compiled programs of the serving engine.  Static shapes throughout —
prefill is always [1, prefill_chunk] and decode always [max_batch] x
DECODE_STEPS — so XLA compiles each exactly once per model.

Why decode runs DECODE_STEPS tokens per dispatch (lax.scan with the sampled
token fed back inside the scan): every host->device dispatch costs real
latency (tens of ms through a tunneled TPU), and decode math per step is
small; scanning N steps amortizes dispatch to nothing and lets XLA overlap
the host roundtrip with compute.  The host scheduler pre-extends page tables
so every active sequence owns pages covering the next N positions before the
call.

Sampling happens inside the step (sampling.py): tokens never round-trip to
the host mid-chunk.  EOS inside a chunk sets a done flag; the sequence keeps
computing (masked, its pages already reserved) and the host trims at the
chunk boundary — control flow is data, never shape.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from caesar_tpu.engine import kvcache
from caesar_tpu.engine.kvcache import PagedKVCache
from caesar_tpu.engine.model import (
    ModelSpec,
    linear,
    mlp,
    qkv_project,
    rms_norm,
)
from caesar_tpu.engine.sampling import sample_tokens


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "tokens",
        "positions",
        "page_tables",
        "done",
        "active",
        "eos_floor",
        "stop_pos",
        "temperature",
        "top_k",
        "top_p",
        "rng",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class DecodeState:
    """Per-slot decode batch state (all [B] unless noted).

    tokens    — the token to FEED next (last prompt token or last sample)
    positions — absolute position of that token
    page_tables — [B, max_pages] page ids covering positions written so far
                  plus the pre-reserved decode headroom
    done      — sequence finished (EOS or length cap); still computes, masked
    active    — slot holds a live sequence at all (inactive slots write to
                the reserved scratch page 0)
    """

    tokens: jax.Array
    positions: jax.Array
    page_tables: jax.Array
    done: jax.Array
    active: jax.Array
    #: positions below this value have EOS suppressed in the logits
    #: (min_tokens support: prompt_len + min_tokens - 1)
    eos_floor: jax.Array
    #: feed position of the LAST allowed token (prompt_len + max_tokens - 2):
    #: done is set once positions pass it, so the device stops sampling a
    #: sequence at its max_tokens without a host round-trip — what lets the
    #: engine chain decode chunks from device state (decode_pipeline > 1)
    stop_pos: jax.Array
    temperature: jax.Array
    top_k: jax.Array
    top_p: jax.Array
    rng: jax.Array


def _lm_head(
    spec: ModelSpec, params: dict, x: jax.Array,
    tp_axis: Optional[str] = None,
) -> jax.Array:
    if spec.tie_embeddings:
        # embeddings are replicated under TP: full logits on every shard
        return jnp.dot(
            x, params["embed"].T, preferred_element_type=jnp.float32
        )
    # untied head may be a QuantizedLinear (engine.quant_head).  The
    # logits stay in the activation dtype (bf16): linear() rounds to bf16
    # anyway, so a f32 cast here adds zero information — it just doubles
    # the [B, vocab] stream sampling re-reads (29 MB at 7B B=48) and the
    # TP logits all-gather's ICI bytes.  Comparisons (argmax, top-k
    # thresholds) are value-identical on the rounded values; the
    # non-greedy softmax path upcasts internally (sampling.py).
    logits = linear(x, params["unembed"])
    if tp_axis is not None:
        # vocab-sharded head: gather the shards' logit tiles (contiguous
        # vocab chunks in shard order) so sampling sees the full row
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    return logits


def _paged_attention(
    spec: ModelSpec,
    cache: PagedKVCache,
    layer_idx: int,
    q: jax.Array,  # [B, T, n_heads, hd]
    page_tables: jax.Array,  # [B, max_pages]
    q_positions: jax.Array,  # [B, T] absolute positions of the queries
) -> jax.Array:
    """Attention over gathered pages, masked to k_pos <= q_pos.

    XLA reference path; the Pallas paged-attention kernel (ops/paged_attention
    .py) replaces it on TPU for decode."""
    b, t, n_heads, hd = q.shape
    # gather_kv returns HEAD-MAJOR [B, n_kv, S, hd] — matching the pool's
    # head-major layout (kvcache.py): the einsums below then consume K/V in
    # the pool's DEFAULT layout, so XLA layout assignment leaves the pool
    # parameters alone.  (With heads inside the page, the scatters' +
    # dots' preferred tiling propagated into the pool parameters and XLA
    # relayout-copied both 2.6 GB pools per prefill dispatch — OOM at 7B.)
    k, v = kvcache.gather_kv(cache, layer_idx, page_tables)
    s = k.shape[2]
    n_kv = k.shape[1]
    groups = n_heads // n_kv

    qg = q.reshape(b, t, n_kv, groups, hd)
    scores = jnp.einsum(
        "btkgh,bksh->bkgts", qg, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(hd))
    k_pos = jnp.arange(s)[None, None, :]  # positions == gather order
    mask = k_pos <= q_positions[:, :, None]  # [B, T, S]
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgts,bksh->btkgh", probs, v)
    return out.reshape(b, t, n_heads, hd)


# ----------------------------------------------------------------------
# prefill
# ----------------------------------------------------------------------


def _prefill_impl(
    spec: ModelSpec,
    params: dict,
    cache: PagedKVCache,
    tokens: jax.Array,  # [P, T]
    positions: jax.Array,  # [P, T]
    page_table: jax.Array,  # [P, W]
    chunk_page_ids: jax.Array,  # [P, T // page_size]
    last_index: jax.Array,  # [P]
    tp_axis: Optional[str] = None,
    use_kernel: bool = False,
    interpret: bool = False,
) -> Tuple[PagedKVCache, jax.Array]:
    """Prefill body, shared by the single-device jit and the shard_map
    tensor-parallel wrapper (tp_axis set => spec is the LOCAL shard's head
    counts; row-parallel wo/down psum explicitly).

    BATCHED over P sequences: each row is an independent chunk (own
    positions, own page table) — the rows share one weight stream, so P
    pending prefills cost barely more than one (prefill at serving chunk
    sizes is dominated by per-chunk fixed work, not tokens).  Padding rows
    write to scratch page 0 and their logits row is discarded by the host.
    """
    from caesar_tpu.engine.model import rope_tables

    x = params["embed"][tokens]  # [P, T, D]
    # rope tables are position-only: compute once per chunk, not per layer
    rope = rope_tables(positions, spec.head_dim, spec.rope_theta)
    for layer_idx, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["ln_attn"], spec.rms_eps)
        q, k, v = qkv_project(spec, layer, h, positions, rope=rope)
        if use_kernel:
            # DMA page writer instead of the XLA scatter (kv_writer.py)
            cache = kvcache.write_chunk_batch_kernel(
                cache, layer_idx, chunk_page_ids, k, v, interpret=interpret
            )
        else:
            cache = kvcache.write_chunk_batch(
                cache, layer_idx, chunk_page_ids, k, v
            )
        if use_kernel:
            from caesar_tpu.ops.prefill_attention import prefill_attention

            # flash kernel over the just-written pages: no [P,T,S] score
            # materialization (the round-3 prefill bottleneck + OOM)
            attn = prefill_attention(
                q, cache.k_pages, cache.v_pages, page_table,
                positions[:, 0], jnp.asarray(layer_idx, jnp.int32),
                cache.page_size, interpret=interpret,
            )
        else:
            attn = _paged_attention(
                spec, cache, layer_idx, q, page_table, positions
            )
        delta = linear(attn.reshape(*attn.shape[:2], spec.q_dim), layer["wo"],
                       tp_axis=tp_axis)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)  # row-parallel wo
        x = x + delta
        h = rms_norm(x, layer["ln_mlp"], spec.rms_eps)
        delta = mlp(layer["mlp"], h, tp_axis=tp_axis)
        if tp_axis is not None:
            delta = jax.lax.psum(delta, tp_axis)  # row-parallel down
        x = x + delta
    x = rms_norm(x, params["ln_out"], spec.rms_eps)
    last_hidden = jnp.take_along_axis(
        x, last_index[:, None, None], axis=1
    )[:, 0]  # [P, D]
    return cache, _lm_head(spec, params, last_hidden, tp_axis)


@functools.partial(
    jax.jit, static_argnums=(0, 8), donate_argnums=(2,)
)
def prefill_chunk(
    spec: ModelSpec,
    params: dict,
    cache: PagedKVCache,
    tokens: jax.Array,  # [P, T] — one page-aligned chunk per row, padded
    positions: jax.Array,  # [P, T] absolute positions (past_len + arange)
    page_table: jax.Array,  # [P, W] — full tables incl. the chunks' pages
    chunk_page_ids: jax.Array,  # [P, T // page_size] — where each row writes
    last_index: jax.Array,  # [P] — index of the real last token per row
    use_kernel: bool = False,
) -> Tuple[PagedKVCache, jax.Array]:
    """Run one prefill chunk for each of P sequences; returns (cache, logits
    of each row's last real token [P, vocab])."""
    interpret = jax.default_backend() != "tpu"
    return _prefill_impl(
        spec, params, cache, tokens, positions, page_table,
        chunk_page_ids, last_index,
        use_kernel=use_kernel, interpret=interpret,
    )


def _unpack_prefill(packed: jax.Array, chunk: int, page_size: int):
    """Split the one-transfer staging buffer (engine._prefill_one_chunk):
    [P, chunk | chunk//page | 1 | 1 | W] int32 =
    tokens | chunk_page_ids | last_index | start | page_table.
    positions are derived on device (start + arange) — five small
    host->device transfers per dispatch each paid a tunnel round trip."""
    pages = chunk // page_size
    tokens = packed[:, :chunk]
    chunk_page_ids = packed[:, chunk : chunk + pages]
    last_index = packed[:, chunk + pages]
    start = packed[:, chunk + pages + 1]
    page_table = packed[:, chunk + pages + 2 :]
    positions = start[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None, :]
    return tokens, positions, page_table, chunk_page_ids, last_index


@functools.partial(
    jax.jit, static_argnums=(0, 4, 5), donate_argnums=(2,)
)
def prefill_chunk_packed(
    spec: ModelSpec,
    params: dict,
    cache: PagedKVCache,
    packed: jax.Array,  # [P, chunk + chunk//page + 2 + W] int32
    chunk: int,
    use_kernel: bool = False,
) -> Tuple[PagedKVCache, jax.Array]:
    """prefill_chunk with single-buffer staging (see _unpack_prefill)."""
    interpret = jax.default_backend() != "tpu"
    tokens, positions, page_table, chunk_page_ids, last_index = (
        _unpack_prefill(packed, chunk, cache.page_size)
    )
    return _prefill_impl(
        spec, params, cache, tokens, positions, page_table,
        chunk_page_ids, last_index,
        use_kernel=use_kernel, interpret=interpret,
    )


# ----------------------------------------------------------------------
# decode
# ----------------------------------------------------------------------


def _decode_one(
    spec: ModelSpec,
    params: dict,
    cache: PagedKVCache,
    state: DecodeState,
    eos_id: int,
    use_kernel: bool = False,
    tp_axis: Optional[str] = None,
    interpret: bool = False,
    microbatches: int = 1,
) -> Tuple[PagedKVCache, DecodeState, jax.Array]:
    """One decode step for the whole batch; returns sampled tokens [B].

    With tp_axis set the function runs INSIDE shard_map over that mesh axis
    (spec must then be the LOCAL shard's head counts): attention and the
    column-parallel matmuls are shard-local, and the two row-parallel
    projections (wo, mlp down) psum explicitly — the Megatron pairing the
    GSPMD path expressed implicitly, now manual so the Pallas kernels can
    run per-shard.

    microbatches > 1 (tensor-parallel only): the batch is split into
    independent slices walked layer-major/slice-minor, so slice i's
    row-parallel psums have no data dependency on slice i+1's matmuls —
    XLA's async collectives + latency-hiding scheduler overlap the
    all-reduce of one slice with the compute of the next (SURVEY §2.3's
    "collectives overlapped with decode compute").  Numerics are identical
    to microbatches=1: each slice computes exactly the rows it would have
    computed inside the full-batch matmuls, and the slices reassemble in
    slot order before sampling.
    """
    b = state.tokens.shape[0]
    page_size = cache.page_size

    x = params["embed"][state.tokens][:, None]  # [B, 1, D]

    # `live`: this step feeds a REAL token (active slot, not yet done).
    # Done rows feed the frozen EOS — their write parks on the reserved
    # scratch page 0 and their position stops advancing, so positions stay
    # <= stop_pos + 1 < max_seq_len by construction and the page-table
    # lookup below can never index past the table (chained chunks used to
    # run positions past max_seq_len and lean on JAX OOB-gather semantics).
    live = state.active & ~state.done
    write_pages_all = jnp.take_along_axis(
        state.page_tables, (state.positions // page_size)[:, None], axis=1
    )[:, 0]
    write_pages = jnp.where(live, write_pages_all, 0)
    write_slots = state.positions % page_size

    nm = microbatches if microbatches > 1 and b % microbatches == 0 else 1
    mb = b // nm

    def split(a):
        return [a[i * mb : (i + 1) * mb] for i in range(nm)]

    xs = split(x)
    positions_s = split(state.positions)
    tables_s = split(state.page_tables)
    write_pages_s = split(write_pages)
    write_slots_s = split(write_slots)
    skip_s = split(state.done | ~state.active)

    # NOTE (round 5, measured): padding the batch rows once per step to the
    # int8 sublane multiple — so the per-matmul pads become no-ops — was
    # tried and measured +0.5 ms/step at 7B B=48 (clean same-process A/B,
    # docs/ENGINE.md): the extra 16 rows of attention / kv-write / norm /
    # rope work cost more than the 8 small pad copies XLA was already
    # folding into kernel operand prep.  Per-matmul padding stays.

    # rope tables are position-only: compute once per step, not per layer
    from caesar_tpu.engine.model import rope_tables

    rope_s = [
        rope_tables(positions_s[i][:, None], spec.head_dim, spec.rope_theta)
        for i in range(nm)
    ]

    for layer_idx, layer in enumerate(params["layers"]):
        for i in range(nm):
            pos2d = positions_s[i][:, None]  # [mb, 1]
            h = rms_norm(xs[i], layer["ln_attn"], spec.rms_eps)
            q, k, v = qkv_project(spec, layer, h, pos2d, rope=rope_s[i])
            cache = kvcache.write_token(
                cache, layer_idx, write_pages_s[i], write_slots_s[i],
                k[:, 0], v[:, 0],
            )
            if use_kernel:
                from caesar_tpu.ops.paged_attention import (
                    paged_attention_decode,
                )

                attn = paged_attention_decode(
                    q[:, 0],
                    cache.k_pages,  # full pool: a layer slice would copy
                    cache.v_pages,
                    tables_s[i],
                    positions_s[i],
                    jnp.asarray(layer_idx, dtype=jnp.int32),
                    cache.page_size,
                    # done/inactive rows emit EOS regardless (see `emit`
                    # below): clamp their attention to one scratch token
                    # instead of streaming their full stale context
                    skip=skip_s[i],
                    interpret=interpret,
                )[:, None]
            else:
                attn = _paged_attention(
                    spec, cache, layer_idx, q, tables_s[i], pos2d
                )
            delta = linear(attn.reshape(mb, 1, spec.q_dim), layer["wo"],
                           tp_axis=tp_axis)
            if tp_axis is not None:
                delta = jax.lax.psum(delta, tp_axis)  # row-parallel wo
            xi = xs[i] + delta
            h = rms_norm(xi, layer["ln_mlp"], spec.rms_eps)
            delta = mlp(layer["mlp"], h, tp_axis=tp_axis)
            if tp_axis is not None:
                delta = jax.lax.psum(delta, tp_axis)  # row-parallel down
            xs[i] = xi + delta

    x = xs[0] if nm == 1 else jnp.concatenate(xs, axis=0)
    x = rms_norm(x, params["ln_out"], spec.rms_eps)
    logits = _lm_head(spec, params, x[:, 0], tp_axis)  # [B, vocab]

    # min_tokens: force EOS out of the distribution until the floor.
    # Expressed as a fused iota mask, not .at[eos_id].set — a one-column
    # scatter is an un-fusable copy of the whole [B, vocab] buffer, the
    # mask fuses into the argmax's single read.
    suppress = state.positions < state.eos_floor  # [B]
    vocab_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, logits.shape[-1]), 1
    )
    logits = jnp.where(
        (vocab_iota == eos_id) & suppress[:, None], -jnp.inf, logits
    )

    rng, sub = jax.random.split(state.rng)
    sampled = sample_tokens(
        logits, sub, state.temperature, state.top_k, state.top_p
    )
    # frozen slots emit EOS; live ones their sample
    emit = jnp.where(state.done | ~state.active, eos_id, sampled)
    # done on EOS or once this feed produced the sequence's max_tokens-th
    # token (stop_pos): chained chunks then freeze the row to EOS on device
    new_done = (
        state.done | (emit == eos_id) | (state.positions >= state.stop_pos)
    )

    new_state = DecodeState(
        tokens=emit.astype(state.tokens.dtype),
        positions=state.positions + live.astype(state.positions.dtype),
        page_tables=state.page_tables,
        done=new_done,
        active=state.active,
        eos_floor=state.eos_floor,
        stop_pos=state.stop_pos,
        temperature=state.temperature,
        top_k=state.top_k,
        top_p=state.top_p,
        rng=rng,
    )
    return cache, new_state, emit


@functools.partial(
    jax.jit, static_argnums=(0, 3, 6), donate_argnums=(2, 4)
)
def decode_steps(
    spec: ModelSpec,
    params: dict,
    cache: PagedKVCache,
    n_steps: int,
    state: DecodeState,
    eos_id: jax.Array,
    use_kernel: bool = False,
) -> Tuple[PagedKVCache, DecodeState, jax.Array]:
    """Scan n_steps decode steps; returns (cache, state, tokens [B, n_steps]).

    The host guarantees page_tables cover positions + n_steps before calling.
    use_kernel selects the Pallas paged-attention path (single-device TPU);
    the XLA gather path serves CPU tests and GSPMD-sharded meshes.
    """
    # Pallas on CPU (CAESAR_FORCE_PAGED_KERNEL tests) must run interpreted
    interpret = jax.default_backend() != "tpu"

    def body(carry, _):
        cache, state = carry
        cache, state, emitted = _decode_one(
            spec, params, cache, state, eos_id, use_kernel,
            interpret=interpret,
        )
        return (cache, state), emitted

    (cache, state), tokens = jax.lax.scan(
        body, (cache, state), None, length=n_steps
    )
    return cache, state, tokens.T  # [B, n_steps]


# ----------------------------------------------------------------------
# tensor-parallel dispatch (shard_map over the tp axis)
# ----------------------------------------------------------------------


def _local_shard_spec(spec: ModelSpec, mesh: "jax.sharding.Mesh") -> ModelSpec:
    """The per-shard view of the model: head counts divided over tp (the
    Megatron head-parallel plan in parallel/plan.py)."""
    tp = mesh.shape["tp"]
    if spec.n_heads % tp or spec.n_kv_heads % tp:
        raise ValueError(
            f"tp={tp} must divide n_heads={spec.n_heads} and "
            f"n_kv_heads={spec.n_kv_heads}"
        )
    return dataclasses.replace(
        spec,
        n_heads=spec.n_heads // tp,
        n_kv_heads=spec.n_kv_heads // tp,
    )


def make_sharded_prefill_chunk(
    spec: ModelSpec,
    mesh: "jax.sharding.Mesh",
    params: dict,
    cache: PagedKVCache,
    use_kernel: bool = False,
    chunk: Optional[int] = None,
):
    """Tensor-parallel prefill dispatch: _prefill_impl inside shard_map.

    Prefill under GSPMD would feed the Pallas quant-matmul custom calls
    global shapes the partitioner cannot split; under shard_map each shard
    runs them on its own columns/rows (see make_sharded_decode_steps).

    With `chunk` set the returned function takes the PACKED single-buffer
    staging form (see _unpack_prefill): f(params, cache, packed); without
    it, the legacy 7-argument form."""
    from jax.sharding import PartitionSpec as P

    local_spec = _local_shard_spec(spec, mesh)
    param_specs = jax.tree.map(lambda l: l.sharding.spec, params)
    cache_specs = jax.tree.map(lambda l: l.sharding.spec, cache)
    interpret = jax.default_backend() != "tpu"
    page_size = cache.page_size

    if chunk is not None:
        def inner_packed(params, cache, packed):
            args = _unpack_prefill(packed, chunk, page_size)
            return _prefill_impl(
                local_spec, params, cache, *args, tp_axis="tp",
                use_kernel=use_kernel, interpret=interpret,
            )

        sharded = jax.shard_map(
            inner_packed,
            mesh=mesh,
            in_specs=(param_specs, cache_specs, P()),
            out_specs=(cache_specs, P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(1,))

    def inner(params, cache, tokens, positions, page_table,
              chunk_page_ids, last_index):
        return _prefill_impl(
            local_spec, params, cache, tokens, positions, page_table,
            chunk_page_ids, last_index, tp_axis="tp",
            use_kernel=use_kernel, interpret=interpret,
        )

    sharded = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(param_specs, cache_specs, P(), P(), P(), P(), P()),
        out_specs=(cache_specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))


def make_sharded_decode_steps(
    spec: ModelSpec,
    mesh: "jax.sharding.Mesh",
    params: dict,
    cache: PagedKVCache,
    n_steps: int,
    use_kernel: bool,
    microbatches: int = 2,
):
    """Build the tensor-parallel decode dispatch: the full n_steps scan runs
    inside ONE shard_map region over the "tp" axis.

    Why shard_map and not GSPMD here: the Pallas paged-attention and fused
    dequant-matmul kernels are custom calls GSPMD cannot partition, so the
    round-1 engine disabled them on any mesh — exactly the 8-chip configs
    that matter.  Under shard_map every shard runs the kernels on its own
    kv-heads/columns (attention is fully shard-local in the Megatron
    head-parallel plan), and the only collectives are the per-layer psums
    after the row-parallel wo/down matmuls plus one logits all-gather —
    issued explicitly, so XLA can schedule them asynchronously against
    independent work (the KV scatter of the next layer's write).

    in/out specs are read off the params/cache leaves' actual shardings
    (plan.shard_params placed them), so the one source of truth is the plan.
    """
    from jax.sharding import PartitionSpec as P

    local_spec = _local_shard_spec(spec, mesh)
    param_specs = jax.tree.map(lambda l: l.sharding.spec, params)
    cache_specs = jax.tree.map(lambda l: l.sharding.spec, cache)
    interpret = jax.default_backend() != "tpu"
    state_specs = DecodeState(
        tokens=P(), positions=P(), page_tables=P(), done=P(), active=P(),
        eos_floor=P(), stop_pos=P(), temperature=P(), top_k=P(), top_p=P(),
        rng=P(),
    )

    def inner(params, cache, state, eos_id):
        def body(carry, _):
            c, s = carry
            c, s, emitted = _decode_one(
                local_spec, params, c, s, eos_id, use_kernel,
                tp_axis="tp", interpret=interpret,
                microbatches=microbatches,
            )
            return (c, s), emitted

        (cache, state), tokens = jax.lax.scan(
            body, (cache, state), None, length=n_steps
        )
        return cache, state, tokens.T

    sharded = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(param_specs, cache_specs, state_specs, P()),
        out_specs=(cache_specs, state_specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(1,))
