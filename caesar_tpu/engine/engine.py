"""The serving engine: continuous batching over the paged KV cache.

Architecture (BASELINE.json north star — "a continuous-batching scheduler
that natively drives the Caesar state machine so hundreds of multi-turn
trajectories share one decode loop"):

* A dedicated scheduler thread owns the device: it alternates one prefill
  chunk (one sequence, page-aligned, padded to a static chunk size) with one
  decode chunk (the whole slot batch, DECODE_STEPS tokens per dispatch, see
  step.py).  Trajectory tasks submit GenerateRequests from asyncio and await
  futures; new sequences join the decode batch between chunks — continuous
  batching, no generation ever waits for a "full batch".
* Host-authoritative state: everything except the KV pool (big, donated
  across steps) lives in numpy on the host and is re-staged per dispatch —
  a few KB per chunk, amortized by the multi-step decode.  No device-side
  bookkeeping to corrupt on crash.
* Admission runs the prefix cache (allocator.py): the longest page-aligned
  cached prefix of the prompt is adopted by incref (cross-turn reuse of the
  per-problem initial prompt, SURVEY.md §5.7), only the tail is prefilled.
  On retirement the sequence's full pages are inserted back into the cache.
* The first "decode" step of a sequence re-feeds the last prompt token at
  its original position (rewriting identical KV), so first-token sampling
  uses the same in-jit path as every other token.
"""

from __future__ import annotations

import asyncio
import dataclasses
import functools
import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from caesar_tpu.config import EngineConfig
from caesar_tpu.engine import kvcache, step as step_mod
from caesar_tpu.engine.allocator import OutOfPages, PageAllocator, PrefixCache
from caesar_tpu.engine.model import ModelSpec
from caesar_tpu.engine.quant import QuantizedLinear, quantize_params
from caesar_tpu.engine.step import DecodeState
from caesar_tpu.engine.tokenizer import Tokenizer, load_tokenizer
from caesar_tpu.engine.weights import load_model
from caesar_tpu.harness.generate import GenerateRequest, GenerateResult

DECODE_STEPS = 32  # tokens per decode dispatch (amortizes host latency)


def _enable_persistent_compile_cache() -> None:
    """The decode graph (28-layer scan) takes minutes to compile on first
    run; persist compiled executables across processes."""
    import os

    cache_dir = os.environ.get(
        "CAESAR_JAX_CACHE", os.path.expanduser("~/.cache/caesar_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # low threshold: the prefill gather-window buckets compile in ~7 s
        # each and would otherwise recompile every process (bench showed a
        # window-8 compile landing inside the measured run)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a failure


@dataclasses.dataclass
class _Sequence:
    request: GenerateRequest
    future: Future
    prompt: List[int]
    pages: List[int]  # all pages this sequence references (incl. cached)
    n_cached: int  # prompt tokens adopted from the prefix cache
    prefilled: int  # prompt tokens prefilled so far (excl. cached)
    generated: List[int] = dataclasses.field(default_factory=list)
    slot: int = -1
    submitted_at: float = dataclasses.field(default_factory=time.monotonic)

    def all_tokens(self) -> List[int]:
        """prompt + generated — the token stream whose KV must be resident.
        After a preemption (pages released under memory pressure) the
        generated tokens are re-prefilled from here: preemption-by-recompute.
        """
        return self.prompt + self.generated

    @property
    def prompt_done(self) -> bool:
        return self.n_cached + self.prefilled >= len(self.all_tokens())


@dataclasses.dataclass
class _DecodeChain:
    """A run of decode chunks dispatched without host round-trips between
    them (econf.decode_pipeline > 1).

    The first chunk is staged from host state as usual; every further chunk
    is dispatched from the DEVICE DecodeState the previous dispatch returned
    (tokens, positions, done flags already live there), so the token fetch
    of chunk k overlaps chunk k+1's execution on device.  Correctness
    invariants:

    * stop_pos freezes each sequence to EOS on device at its max_tokens, so
      chained chunks never emit real tokens the host would have cut off.
    * Page headroom for the whole chain is reserved at staging; positions
      past a sequence's reservation fall through to the scratch page 0
      (table entries default to 0), which is never read unmasked.
    * Pages freed while chunks are in flight (retire/preempt) are
      QUARANTINED, not returned to the allocator, until the chain drains —
      an in-flight chunk still writes through the stale device page tables.
    * The chain stops topping up as soon as new work arrives (pending
      requests / preempted seqs / an active prefill), bounding added
      admission latency to the in-flight chunks.
    """

    staged: List[_Sequence]
    live: List[_Sequence]  # staged minus retired-so-far
    device_state: "DecodeState"  # state after the LAST dispatched chunk
    inflight: List[object]  # device token arrays, oldest first
    budget: int  # chunks this chain may still dispatch
    quarantine: List[int]  # page frees deferred to chain end
    t_account: float  # start of the unaccounted wall-time span


class EngineStats:
    def __init__(self) -> None:
        self.prefill_tokens = 0
        self.decode_tokens = 0
        self.completed = 0
        self.decode_dispatches = 0
        self.prefill_dispatches = 0
        self.preemptions = 0
        self.decode_time_s = 0.0
        self.prefill_time_s = 0.0
        self.batch_occupancy_sum = 0.0

    def snapshot(self, prefix_cache: Optional[PrefixCache]) -> dict:
        d = dict(self.__dict__)
        d["prefix_hit_rate"] = prefix_cache.hit_rate if prefix_cache else 0.0
        d["mean_decode_batch"] = (
            self.batch_occupancy_sum / self.decode_dispatches
            if self.decode_dispatches
            else 0.0
        )
        d["decode_tokens_per_s"] = (
            self.decode_tokens / self.decode_time_s if self.decode_time_s else 0.0
        )
        return d


class Engine:
    """Continuous-batching serving engine over one device (mesh-sharded in
    parallel/plan.py for tp>1)."""

    def __init__(
        self,
        econf: EngineConfig,
        spec: Optional[ModelSpec] = None,
        params: Optional[dict] = None,
        tokenizer: Optional[Tokenizer] = None,
        n_pages: Optional[int] = None,
        decode_steps: int = DECODE_STEPS,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        self.econf = econf
        _enable_persistent_compile_cache()
        if spec is None or params is None:
            # quantization happens on host during load: the bf16 weights of
            # an int8/int4 model never touch HBM
            spec, params = load_model(
                econf.model,
                seed=econf.seed,
                allow_random_init=econf.allow_random_init,
                quant=econf.quant,
                quant_group=econf.quant_group,
            )
        elif econf.quant in ("int8", "w8a8", "int4", "w4a8") and not isinstance(
            params["layers"][0]["wq"], QuantizedLinear
        ):
            from caesar_tpu.engine.weights import resolve_quant_group

            params = quantize_params(
                params,
                bits=4 if econf.quant in ("int4", "w4a8") else 8,
                group=resolve_quant_group(econf.quant, econf.quant_group),
                act="int8" if econf.quant in ("w8a8", "w4a8") else "none",
            )
        self.spec = spec
        self.mesh = mesh
        if mesh is not None:
            from caesar_tpu.parallel.plan import shard_params

            params = shard_params(spec, params, mesh)
        else:
            from caesar_tpu.engine.quant import fuse_params

            params = fuse_params(params)
        self.params = params
        self.tokenizer = tokenizer or load_tokenizer(econf.model)
        self.decode_steps = decode_steps

        self.page_size = econf.page_size
        self.max_pages_per_seq = econf.max_seq_len // econf.page_size
        self.max_batch = econf.max_batch
        self.prefill_chunk = econf.prefill_chunk
        assert self.prefill_chunk % self.page_size == 0
        # chunk-size buckets, smallest first (one compiled program each):
        # batched prefill compute is proportional to PADDED rows x chunk,
        # and prefix-cache hits leave ~100-token tails — a tails-only
        # dispatch drops to the quarter chunk so the pad compute shrinks
        # 4x while the token budget admits 4x the rows per weight stream
        # (measured: the level-2 sweep prefilled 332 real tokens per
        # full-chunk dispatch, 90% pad)
        if n_pages is None:
            n_pages = econf.num_pages or self._auto_pages()
        # bound rows x chunk tokens per batched prefill dispatch against the
        # HBM left after weights + pool (round 3 shipped this unbounded and
        # the config-3 bench OOM'd at compile: 4 rows x 1536 tok of f32
        # gate_up temps = ~930 MB per matmul over budget)
        self.prefill_token_budget = (
            econf.prefill_token_budget or self._auto_prefill_tokens(n_pages)
        )
        self._prefill_dispatch_tokens = max(
            self.prefill_token_budget // max(econf.prefill_inflight, 1),
            self.page_size,
        )
        if self._prefill_dispatch_tokens < self.prefill_chunk:
            # a single chunk must fit the per-dispatch budget: shrink it
            # (page-aligned)
            self.prefill_chunk = max(
                self.page_size,
                self._prefill_dispatch_tokens
                // self.page_size * self.page_size,
            )
        # chunk-size buckets, smallest first (one compiled program each):
        # prefix-cache hits leave ~100-token tails, and a tails-only
        # dispatch drops to the quarter chunk so the pad compute shrinks
        # 4x while the token budget admits 4x the rows per weight stream
        # (measured: the level-2 sweep prefilled 332 real tokens per
        # full-chunk dispatch — 90% pad)
        quarter = max(self.page_size, self.prefill_chunk // 4)
        self._chunk_buckets = tuple(sorted({quarter, self.prefill_chunk}))
        # admission bound: enough prefilling candidates to fill a
        # quarter-bucket dispatch with prefill_batch full-chunks' worth of
        # rows (16 tail rows at the 7B defaults)
        self._admit_cap = max(econf.prefill_batch, 1) * (
            self.prefill_chunk // self._chunk_buckets[0]
        )
        self.cache = kvcache.create_cache(
            spec, n_pages, self.page_size, econf.kv_quant
        )
        if mesh is not None:
            from caesar_tpu.parallel.plan import shard_cache

            self.cache = shard_cache(self.cache, mesh)
        # native C++ allocator/prefix-cache when built (native_bridge.py
        # builds it on demand; Python twins otherwise — identical semantics)
        from caesar_tpu.native_bridge import make_allocator, make_prefix_cache

        self.allocator = make_allocator(n_pages)
        self._scratch_page = self.allocator.alloc(1)[0]  # page 0, never freed
        self.prefix_cache = (
            make_prefix_cache(self.allocator, self.page_size)
            if econf.prefix_cache
            else None
        )

        self.stats = EngineStats()
        self._rng = jax.random.PRNGKey(econf.seed)
        # Pallas paged-attention path: on by default on TPU.  Under a mesh
        # the decode/prefill steps run inside shard_map (step.py), so the
        # kernel sees the shard-local kv heads — no GSPMD gate needed.
        import os as _os

        from caesar_tpu.ops.paged_attention import supports as _pa_supports

        self._use_paged_kernel = (
            not _os.environ.get("CAESAR_DISABLE_PAGED_KERNEL")
            and (
                jax.default_backend() == "tpu"
                or bool(_os.environ.get("CAESAR_FORCE_PAGED_KERNEL"))
            )
            and _pa_supports(spec, self.page_size)
        )
        from caesar_tpu.ops import prefill_attention as _pf

        # prefill flash kernel (no [P,T,S] score materialization); same
        # enable gate as decode plus the prefill block-geometry constraints
        self._use_prefill_kernel = (
            self._use_paged_kernel
            and _pf.supports(spec, self.page_size, self.prefill_chunk)
        )
        self._trace = bool(_os.environ.get("CAESAR_ENGINE_TRACE"))
        if mesh is not None:
            # build the shard_map dispatches once; they read the placed
            # shardings off self.params / self.cache
            self._sharded_decode = step_mod.make_sharded_decode_steps(
                self.spec, mesh, self.params, self.cache,
                self.decode_steps, self._use_paged_kernel,
                microbatches=econf.decode_microbatches,
            )
            self._sharded_prefill = step_mod.make_sharded_prefill_chunk(
                self.spec, mesh, self.params, self.cache,
                use_kernel=self._use_prefill_kernel,
                chunk=self.prefill_chunk,
            )
        else:
            self._sharded_decode = None
            self._sharded_prefill = None

        # host-authoritative slot state
        self._slots: List[Optional[_Sequence]] = [None] * self.max_batch
        self._pending: "queue.Queue[_Sequence]" = queue.Queue()
        self._preempted: List[_Sequence] = []  # readmit before new work
        self._prefilling: List[_Sequence] = []
        self._prefill_unsynced = False  # async prefill queued on device
        #: coalescing state: a partial batch of FRESH rows has been given
        #: one scheduler pass to collect co-riders (econf.prefill_coalesce)
        self._prefill_deferred = False
        #: logits handles of queued prefill dispatches, oldest first —
        #: fetched beyond econf.prefill_inflight so queued programs' temp
        #: buffers (allocated at enqueue) never stack past the HBM budget
        self._prefill_queue: List[object] = []
        self._chain: Optional[_DecodeChain] = None  # pipelined decode run

        self._wake = threading.Event()
        self._stats_reset = threading.Event()
        self._running = True
        self._fatal: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._loop, name="caesar-engine", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------------
    def _hbm_bytes(self) -> int:
        """Device HBM capacity: feeds _auto_pages and _auto_prefill_tokens.

        Asks PJRT first (memory_stats()['bytes_limit']) so v4/v5p/v6e chips
        size the pool and prefill budget from their real HBM instead of a
        v5e-sized constant; falls back to 16 GiB only when the backend does
        not report (e.g. the axon tunnel plugin)."""
        try:
            dev = jax.devices()[0]
            if dev.platform == "tpu":
                try:
                    limit = (dev.memory_stats() or {}).get("bytes_limit", 0)
                except Exception:
                    limit = 0
                if limit and limit > 2 ** 30:
                    return int(limit)
                return 16 * 2 ** 30  # v5e / unknown
        except Exception:
            pass
        return 4 * 2 ** 30  # CPU tests: keep it small

    def _param_bytes(self) -> int:
        """Honest on-device weight footprint: embeddings STAY bf16 under
        every quant mode (only linears quantize), which param_bytes'
        uniform bytes-per-weight assumption undercounts by ~0.5 GB at 7B
        int8 — enough to blow the real HBM headroom (round-4 bench hit
        RESOURCE_EXHAUSTED on exactly that margin)."""
        bytes_per_w = {
            "bf16": 2.0, "int8": 1.0, "w8a8": 1.0, "int4": 0.5, "w4a8": 0.5,
        }[self.econf.quant]
        correction = int(self.spec.vocab * self.spec.dim * (2 - bytes_per_w))
        return int(self.spec.param_bytes(bytes_per_w)) + max(correction, 0)

    def _auto_pages(self) -> int:
        """Size the page pool from the device HBM budget (single chip)."""
        hbm = self._hbm_bytes()
        budget = hbm - self._param_bytes() - 2 * 2 ** 30
        page_bytes = kvcache.cache_bytes(
            self.spec, 1, self.page_size, self.econf.kv_quant
        )
        n = max(budget // page_bytes, 0)
        floor = self.max_batch * 4  # always enough to admit the batch
        ceil = self.max_batch * self.max_pages_per_seq + 1
        return int(min(max(n, floor), ceil))

    def _auto_prefill_tokens(self, n_pages: int) -> int:
        """Max prefill tokens IN FLIGHT on the device, from the HBM
        headroom after weights + pool.

        Prefill dispatches are asynchronous and PJRT allocates each queued
        program's temp buffers at enqueue, so the bound must cover every
        in-flight dispatch, not just one (the scheduler divides this by
        econf.prefill_inflight per dispatch and syncs beyond that depth).
        Temps modeled at 16*hidden + 32*dim bytes/token (i32 + f32 gate_up
        fusion outputs dominate; ~370 KB at 7B) with 512 MB slack."""
        free = (
            self._hbm_bytes()
            - self._param_bytes()
            - kvcache.cache_bytes(
                self.spec, n_pages, self.page_size, self.econf.kv_quant
            )
            - 2 ** 29
        )
        act_bytes = 16 * self.spec.hidden + 32 * self.spec.dim
        budget = int(free // act_bytes)
        return min(max(budget, self.page_size), 8192)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    async def generate(self, request: GenerateRequest) -> GenerateResult:
        future = self.submit(request)
        return await asyncio.wrap_future(future)

    def submit(self, request: GenerateRequest) -> Future:
        """Thread-safe submission; returns a concurrent Future."""
        if self._fatal is not None:
            raise RuntimeError("engine loop died") from self._fatal
        future: Future = Future()
        prompt = self.tokenizer.encode(request.prompt)
        # leave room for at least one generated token; a too-long prompt
        # fails loudly — silently truncating the tail would drop the
        # harness's instruction block and change the task
        max_prompt = self.econf.max_seq_len - 1
        if len(prompt) > max_prompt:
            future.set_exception(
                ValueError(
                    f"prompt is {len(prompt)} tokens but max_seq_len="
                    f"{self.econf.max_seq_len} leaves room for {max_prompt}"
                )
            )
            return future
        seq = _Sequence(request=request, future=future, prompt=prompt,
                        pages=[], n_cached=0, prefilled=0)
        self._pending.put(seq)
        self._wake.set()
        return future

    def generate_sync(self, request: GenerateRequest) -> GenerateResult:
        return self.submit(request).result()

    def reset_stats(self) -> None:
        """Swap in fresh counters at the next scheduler-loop boundary.

        Replacing `engine.stats` from another thread mid-chunk would let
        counters straddle the swap; the scheduler thread performs the swap
        itself between chunks."""
        self._stats_reset.set()
        self._wake.set()

    def close(self) -> None:
        self._running = False
        self._wake.set()
        self._thread.join(timeout=30)

    async def aclose(self) -> None:
        await asyncio.to_thread(self.close)

    # ------------------------------------------------------------------
    # scheduler loop
    # ------------------------------------------------------------------

    def _loop(self) -> None:
        try:
            while self._running:
                if self._stats_reset.is_set():
                    self.stats = EngineStats()
                    self._stats_reset.clear()
                progressed = False
                progressed |= self._admit()
                progressed |= self._prefill_one_chunk()
                if self.econf.prefill_priority and not self._prefill_deferred and (
                    self._prefilling
                    or (
                        not self._pending.empty()
                        and any(s is None for s in self._slots)
                        and progressed  # admission succeeded; keep filling
                    )
                ):
                    # keep filling the batch before burning decode steps on
                    # a half-empty batch (throughput-first admission)
                    continue
                progressed |= self._decode_chunk()
                if not progressed:
                    self._wake.wait(timeout=0.01)
                    self._wake.clear()
        except BaseException as e:  # surface fatal errors to submitters
            self._fatal = e
            for slot in self._slots:
                if slot is not None and not slot.future.done():
                    slot.future.set_exception(e)
            for seq in self._prefilling:
                if not seq.future.done():
                    seq.future.set_exception(e)
            while True:
                try:
                    seq = self._pending.get_nowait()
                except queue.Empty:
                    break
                if not seq.future.done():
                    seq.future.set_exception(e)

    # ------------------------------------------------------------------
    def _alloc(self, n: int) -> List[int]:
        if self.prefix_cache is not None:
            return self.prefix_cache.alloc_with_eviction(n)
        return self.allocator.alloc(n)

    def _pages_evictable(self) -> int:
        return len(self.prefix_cache) if self.prefix_cache is not None else 0

    def _admit(self) -> bool:
        """Start prefilling waiting sequences while prefill-batch rows, slot
        space, and the page pool allow (admission control: a request that
        cannot fit must wait, never kill the engine).

        Up to econf.prefill_batch sequences prefill together — their chunks
        are rows of ONE batched prefill dispatch sharing the weight stream
        (step.prefill_chunk), which is what keeps prefill from starving the
        decode batch at high trajectory counts."""
        admitted = False
        while len(self._prefilling) < self._admit_cap:
            # every prefilling sequence will need a decode slot when it seats
            free_slots = sum(s is None for s in self._slots) - len(
                self._prefilling
            )
            if free_slots <= 0:
                break
            if self._preempted:
                seq = self._preempted.pop(0)
            else:
                try:
                    seq = self._pending.get_nowait()
                except queue.Empty:
                    break

            total = seq.all_tokens()
            # a sequence that could never fit the pool fails loudly instead
            # of livelocking through preemption
            worst_case_pages = (
                -(-(len(seq.prompt) + seq.request.max_tokens)
                  // self.page_size) + 1
            )
            if worst_case_pages > self.allocator.n_pages - 1:
                if not seq.future.done():
                    seq.future.set_exception(
                        RuntimeError(
                            f"sequence needs {worst_case_pages} KV pages but "
                            f"the pool holds {self.allocator.n_pages}"
                        )
                    )
                admitted = True
                continue

            # pages the already-admitted prefill rows still need, so a batch
            # of admissions cannot jointly overcommit the pool
            reserved = sum(
                max(-(-len(s.all_tokens()) // self.page_size) + 2
                    - len(s.pages), 0)
                for s in self._prefilling
            )
            needed_now = -(-len(total) // self.page_size) + 2  # + headroom
            if needed_now + reserved > (
                self.allocator.free_pages + self._pages_evictable()
            ):
                # pool pressure: wait for retirements
                self._preempted.insert(0, seq)
                break

            if self.prefix_cache is not None:
                pages, n_cached = self.prefix_cache.match(total)
                # always recompute at least the last token so decode can
                # re-feed it
                while n_cached >= len(total) and pages:
                    page = pages.pop()
                    self.allocator.decref(page)
                    n_cached -= self.page_size
                seq.pages = pages
                seq.n_cached = n_cached

            self._prefilling.append(seq)
            admitted = True
        return admitted

    def _prefill_one_chunk(self) -> bool:
        """Dispatch one BATCHED prefill step: one chunk for every sequence
        currently prefilling (rows of step.prefill_chunk share the weight
        stream).  Row count buckets to a power of two; padding rows write
        to scratch page 0 and their logits are discarded."""
        if not self._prefilling:
            return False
        t0 = time.monotonic()
        # smallest chunk bucket covering every candidate's remaining tail:
        # a mid-prompt row forces the full chunk; a tails-only pass (the
        # common steady state with the prefix cache at 0.95 hit) drops to
        # the quarter bucket — 4x less pad compute, 4x the rows per
        # weight stream under the same token budget
        if self._sharded_prefill is not None:
            # the TP dispatch is compiled for one chunk size (shard_map
            # closure, make_sharded_prefill_chunk) — no buckets there
            chunk = self.prefill_chunk
        else:
            max_rem = max(
                len(s.all_tokens()) - s.n_cached - s.prefilled
                for s in self._prefilling
            )
            chunk = next(
                (b for b in self._chunk_buckets if b >= max_rem),
                self.prefill_chunk,
            )
        n_chunk_pages = chunk // self.page_size
        # HBM-derived token bound: at most budget // chunk rows per dispatch
        # (remaining prefilling rows wait for the next scheduler pass).
        # The row target scales inversely with the bucket — quarter-chunk
        # dispatches carry 4x the rows for the SAME padded token count;
        # full-chunk dispatches keep the measured-optimal prefill_batch
        # (6 full rows were tried and regressed: compute-bound, see
        # config.prefill_batch).
        rows_target = max(self.econf.prefill_batch, 1) * (
            self.prefill_chunk // chunk
        )
        rows_cap = max(self._prefill_dispatch_tokens // chunk, 1)
        rows_cap = min(rows_cap, rows_target)

        # coalesce ragged arrivals: a PARTIAL batch of rows that haven't
        # started prefilling yet waits exactly one scheduler pass (one
        # decode chunk) for co-riders — per-dispatch cost is dominated by
        # the weight stream + fixed work, so 1-row dispatches waste most
        # of it.  One pass, not wall-clock: it self-scales from ms-long
        # tiny-model chunks to the 7B's ~0.5 s chunks.
        full = rows_cap  # already min(budget rows, bucket-scaled target)
        if (
            self.econf.prefill_coalesce
            and not self._prefill_deferred
            and len(self._prefilling) < full
            and all(s.prefilled == 0 for s in self._prefilling)
            and any(s is not None for s in self._slots)
            # only defer when a co-rider can actually arrive this pass —
            # waiting on an empty admission queue just costs the lone
            # request one decode chunk of TTFT
            and (not self._pending.empty() or bool(self._preempted))
        ):
            self._prefill_deferred = True
            return False  # let a decode chunk run; retry next pass
        self._prefill_deferred = False

        rows = []  # (seq, real_t, new_pages)
        need_max = 1
        for seq in list(self._prefilling)[:rows_cap]:
            all_tokens = seq.all_tokens()
            start = seq.n_cached + seq.prefilled
            try:
                new_pages = self._alloc(n_chunk_pages)
            except OutOfPages:
                # pool pressure mid-prefill: release and retry later
                self._prefilling.remove(seq)
                self._preempt(seq)
                continue
            seq.pages.extend(new_pages)
            # full-chunk-allocation invariant the prefill kernel's
            # n_pages_row depends on (ops/prefill_attention.py): every page
            # covering [0, start + chunk) exists, even for a partial final
            # chunk — tail DMAs must never hit unallocated table slots
            assert len(seq.pages) == (start + chunk) // self.page_size, (
                len(seq.pages), start, chunk, self.page_size
            )
            real_t = min(len(all_tokens) - start, chunk)
            rows.append((seq, real_t, new_pages))
            need_max = max(need_max, -(-(start + chunk) // self.page_size))
        if not rows:
            return True  # the preemptions were the progress

        p = 1  # row-count bucket (one compile per bucket)
        while p < len(rows):
            p *= 2
        # never pad the bucket past the HBM budget's row cap: temps scale
        # with PADDED rows, and rows_cap is what _auto_prefill_tokens
        # guarantees fits — a power-of-two bucket above it (e.g. 8 when
        # the 7B budget admits 6) would overshoot the bound the budget
        # exists to enforce.  rows_cap >= len(rows) by construction.
        p = min(p, max(rows_cap, 1))
        # static gather window: just the pages covering the deepest row's
        # last position, rounded up to a power of two (one compile per
        # bucket).  The XLA prefill-attention path materializes
        # [P, T, window*page] scores per layer — gathering the full
        # max_seq_len table cost ~0.5 GB of score traffic per layer for a
        # 256-token prompt.
        window = 1
        while window < need_max:
            window *= 2
        window = min(window, self.max_pages_per_seq)
        # ONE staging buffer per dispatch (step._unpack_prefill layout:
        # tokens | chunk pages | last | start | table) — five separate
        # transfers each paid a host->device tunnel round trip per dispatch
        packed = np.zeros(
            (p, chunk + n_chunk_pages + 2 + window), dtype=np.int32
        )
        for i, (seq, real_t, new_pages) in enumerate(rows):
            start = seq.n_cached + seq.prefilled
            packed[i, :real_t] = seq.all_tokens()[start : start + real_t]
            packed[i, chunk : chunk + n_chunk_pages] = new_pages
            packed[i, chunk + n_chunk_pages] = real_t - 1
            packed[i, chunk + n_chunk_pages + 1] = start
            n_table = min(len(seq.pages), window)
            packed[
                i,
                chunk + n_chunk_pages + 2 : chunk + n_chunk_pages + 2
                + n_table,
            ] = seq.pages[:n_table]

        t_stage = time.monotonic()
        packed_dev = jnp.asarray(packed)
        t_enq = time.monotonic()
        if self._sharded_prefill is not None:
            self.cache, _logits = self._sharded_prefill(
                self.params, self.cache, packed_dev
            )
        else:
            self.cache, _logits = step_mod.prefill_chunk_packed(
                self.spec, self.params, self.cache, packed_dev,
                chunk, self._use_prefill_kernel,
            )
        t_drain = time.monotonic()
        self.stats.prefill_dispatches += 1
        self._prefill_unsynced = True
        # bound queued-dispatch temps: block on the oldest dispatch once
        # more than prefill_inflight are outstanding (execution is
        # in-order, so fetching one scalar of dispatch k-depth drains it)
        self._prefill_queue.append(_logits)
        while len(self._prefill_queue) > max(self.econf.prefill_inflight, 1):
            np.asarray(self._prefill_queue.pop(0)[:1, :1])
        t_end = time.monotonic()

        for seq, real_t, _ in rows:
            seq.prefilled += real_t
            self.stats.prefill_tokens += real_t
            if seq.prompt_done:
                # trim over-allocated pages beyond the prompt (pad pages
                # stay — they are within the last chunk; drop whole-page
                # overshoot)
                needed = -(-len(seq.all_tokens()) // self.page_size)
                while len(seq.pages) > needed:
                    self.allocator.decref(seq.pages.pop())
                slot = self._slots.index(None)
                seq.slot = slot
                self._slots[slot] = seq
                self._prefilling.remove(seq)

        dt = time.monotonic() - t0
        self.stats.prefill_time_s += dt
        if self._chain is not None:
            # this span is prefill time; without the shift the live chain's
            # fetch-to-fetch accounting would count it into decode_time_s too
            self._chain.t_account += dt
        if self._trace:
            print(
                f"[ENGINE prefill] {len(rows)} seqs x {chunk} tok "
                f"(bucket {p}), window {window}, "
                f"dispatch {1e3 * dt:.1f} ms "
                f"(stage {1e3 * (t_enq - t_stage):.1f} "
                f"enq {1e3 * (t_drain - t_enq):.1f} "
                f"drain {1e3 * (t_end - t_drain):.1f})",
                flush=True,
            )
        return True

    # ------------------------------------------------------------------
    def _decode_chunk(self) -> bool:
        """Run the decode pipeline one fetch forward.

        Stages a new chain from host state when none is active, keeps up to
        econf.decode_pipeline chunks in flight (chained from device state,
        no host round-trip between them), then fetches the OLDEST chunk's
        tokens — the fetch overlaps the later chunks' execution."""
        if self._chain is None and not self._start_chain():
            return False
        chain = self._chain
        if chain is None:
            # staging preempted every staged sequence — that was the progress
            return True
        depth = max(self.econf.decode_pipeline, 1)
        # a sequence that finished prefill mid-chain sits in _slots but not
        # in chain.staged: keep topping up and its decode would starve for
        # the chain's whole budget — stop, drain, restage with it instead
        staged_ids = {id(s) for s in chain.staged}
        while (
            len(chain.inflight) < depth
            and chain.budget > 0
            and chain.live
            and self._pending.empty()
            and not self._prefilling
            and not self._preempted
            and all(
                sl is None or id(sl) in staged_ids for sl in self._slots
            )
        ):
            self._dispatch_chained(chain)

        t_fetch = time.monotonic()
        out = np.asarray(chain.inflight.pop(0))  # blocks on oldest chunk only
        if self._trace:
            print(
                f"[ENGINE chunk] fetch {1e3 * (time.monotonic() - t_fetch):.1f}"
                f" ms, {len(chain.inflight)} still in flight, "
                f"budget {chain.budget}",
                flush=True,
            )
        self._emit_chunk(chain, out)
        now = time.monotonic()
        self.stats.decode_time_s += now - chain.t_account
        chain.t_account = now
        if not chain.inflight:
            # chain drained: stale device page tables are no longer in use,
            # quarantined pages may circulate again
            for page in chain.quarantine:
                self.allocator.decref(page)
            self._chain = None
        return True

    def _start_chain(self) -> bool:
        """Stage a decode chain from host state and dispatch its first chunk."""
        b = self.max_batch
        n = self.decode_steps
        # safety net: retire sequences that cannot feed even one more real
        # token (stop_pos < feed position).  _emit_chunk retires at the
        # max_seq_len cap so this should never fire; crucially it must NOT
        # fire for a freshly admitted near-max_seq_len prompt — the device
        # freezes rows past stop_pos (step.py `live`), so a final partial
        # chunk is always legal and every admitted sequence generates at
        # least one token (no silent empty completions).
        for seq in [s for s in self._slots if s is not None]:
            next_pos = len(seq.prompt) + len(seq.generated) - 1
            if next_pos > self.econf.max_seq_len - 2:
                self._retire(seq)
        active = [s for s in self._slots if s is not None]
        if not active:
            return False
        if self._prefill_unsynced:
            # prefill dispatches are async; drain the device queue HERE so
            # the queued prefill programs' device time lands in
            # prefill_time_s, not in the first decode chunk's accounting
            t_sync = time.monotonic()
            np.asarray(self.cache.k_pages[(0,) * self.cache.k_pages.ndim])
            self.stats.prefill_time_s += time.monotonic() - t_sync
            self._prefill_unsynced = False
            self._prefill_queue.clear()
        t0 = time.monotonic()

        tokens = np.zeros(b, dtype=np.int32)
        positions = np.zeros(b, dtype=np.int32)
        tables = np.zeros((b, self.max_pages_per_seq), dtype=np.int32)
        active_mask = np.zeros(b, dtype=bool)
        eos_floor = np.zeros(b, dtype=np.int32)
        stop_pos = np.full(b, 2**30, dtype=np.int32)
        temperature = np.zeros(b, dtype=np.float32)
        top_k = np.zeros(b, dtype=np.int32)
        top_p = np.ones(b, dtype=np.float32)

        for seq in active:
            i = seq.slot
            if seq.generated:
                tokens[i] = seq.generated[-1]
                positions[i] = len(seq.prompt) + len(seq.generated) - 1
            else:
                # re-feed the final prompt token (rewrites identical KV)
                tokens[i] = seq.prompt[-1]
                positions[i] = len(seq.prompt) - 1
            req = seq.request
            # feed position of the last allowed token: the device freezes
            # the row to EOS past it (max_tokens / max_seq_len enforcement
            # without a host round-trip — what makes chaining legal)
            stop = min(
                len(seq.prompt) + req.max_tokens - 2,
                self.econf.max_seq_len - 2,
            )
            # page headroom covering the chunk's REAL writes (positions past
            # stop freeze and park on scratch page 0 — step.py `live`)
            last_write = min(positions[i] + n - 1, stop)
            needed = min(last_write // self.page_size + 1, self.max_pages_per_seq)
            if needed > len(seq.pages):
                try:
                    seq.pages.extend(self._alloc(needed - len(seq.pages)))
                except OutOfPages:
                    # pressure: preempt this sequence (recomputed later),
                    # freeing its pages for the rest of the batch
                    self._preempt(seq)
                    continue
            active_mask[i] = True
            eos_floor[i] = len(seq.prompt) + getattr(req, "min_tokens", 0) - 1
            stop_pos[i] = stop
            temperature[i] = req.temperature
            top_k[i] = req.top_k
            top_p[i] = req.top_p

        # staging may have preempted sequences out of their slots; emitting
        # for a stale entry would read out[-1] — another slot's row — and
        # corrupt both sequences.  Emit only what was actually staged.
        staged = [s for s in active if s.slot >= 0 and active_mask[s.slot]]
        if not staged:
            return True  # the preemptions were the progress

        # chain budget: chunks until every staged sequence has passed its
        # stop_pos (device emits only EOS beyond that).  decode_pipeline=1
        # disables chaining entirely — every chunk is staged from host state.
        if self.econf.decode_pipeline > 1:
            horizon = max(
                stop_pos[s.slot] - positions[s.slot] + 1 for s in staged
            )
            budget = max(-(-int(horizon) // n), 1)
        else:
            budget = 1
        if budget > 1:
            # reserve the chain's page headroom upfront (writes of REAL
            # tokens only — positions past stop_pos land on scratch page 0).
            # Failure is not an error: the chain just shortens to one chunk
            # and the per-chunk staging path reserves as today.
            for seq in staged:
                i = seq.slot
                last_real = min(positions[i] + budget * n - 1, stop_pos[i])
                needed = min(
                    int(last_real) // self.page_size + 1,
                    self.max_pages_per_seq,
                )
                if needed > len(seq.pages):
                    try:
                        seq.pages.extend(self._alloc(needed - len(seq.pages)))
                    except OutOfPages:
                        budget = 1
                        break
        for seq in staged:
            tables[seq.slot, : len(seq.pages)] = seq.pages

        self._rng, sub = jax.random.split(self._rng)
        state = DecodeState(
            tokens=jnp.asarray(tokens),
            positions=jnp.asarray(positions),
            page_tables=jnp.asarray(tables),
            done=jnp.zeros(b, dtype=bool),
            active=jnp.asarray(active_mask),
            eos_floor=jnp.asarray(eos_floor),
            stop_pos=jnp.asarray(stop_pos),
            temperature=jnp.asarray(temperature),
            top_k=jnp.asarray(top_k),
            top_p=jnp.asarray(top_p),
            rng=sub,
        )
        if self._trace:
            print(
                f"[ENGINE chain] staged {len(staged)} seqs, budget {budget}, "
                f"stage {1e3 * (time.monotonic() - t0):.1f} ms",
                flush=True,
            )
        self._chain = _DecodeChain(
            staged=staged,
            live=list(staged),
            device_state=state,
            inflight=[],
            budget=budget,
            quarantine=[],
            t_account=t0,
        )
        self._dispatch_chained(self._chain)
        return True

    def _dispatch_chained(self, chain: "_DecodeChain") -> None:
        """Dispatch one decode chunk from the chain's device state."""
        eos = jnp.asarray(self.tokenizer.eos_id, dtype=jnp.int32)
        if self._sharded_decode is not None:
            self.cache, state, out = self._sharded_decode(
                self.params, self.cache, chain.device_state, eos
            )
        else:
            self.cache, state, out = step_mod.decode_steps(
                self.spec,
                self.params,
                self.cache,
                self.decode_steps,
                chain.device_state,
                eos,
                self._use_paged_kernel,
            )
        chain.device_state = state
        chain.inflight.append(out)
        chain.budget -= 1
        self.stats.decode_dispatches += 1
        self.stats.batch_occupancy_sum += len(chain.live)

    def _emit_chunk(self, chain: "_DecodeChain", out: np.ndarray) -> None:
        """Append one fetched chunk's tokens; retire finished sequences."""
        emitted = 0
        for seq in list(chain.live):
            row = out[seq.slot]
            for token in row:
                if len(seq.generated) >= seq.request.max_tokens:
                    break
                token = int(token)
                seq.generated.append(token)
                emitted += 1
                if token == self.tokenizer.eos_id:
                    break
            if (
                seq.generated
                and (
                    seq.generated[-1] == self.tokenizer.eos_id
                    or len(seq.generated) >= seq.request.max_tokens
                    or len(seq.prompt) + len(seq.generated)
                    >= self.econf.max_seq_len
                )
            ):
                chain.live.remove(seq)
                self._retire(seq)
        self.stats.decode_tokens += emitted

    # ------------------------------------------------------------------
    def _release_page(self, page: int) -> None:
        """Free a page — or quarantine it while decode chunks are in flight
        (their stale device page tables may still write through it)."""
        if self._chain is not None and self._chain.inflight:
            self._chain.quarantine.append(page)
        else:
            self.allocator.decref(page)

    def _preempt(self, seq: _Sequence) -> None:
        """Release a sequence's pages under pool pressure; it re-enters
        admission and recomputes its KV from prompt+generated (vLLM-style
        preemption-by-recompute: tokens survive, pages do not)."""
        if seq.slot >= 0 and self._slots[seq.slot] is seq:
            self._slots[seq.slot] = None
        seq.slot = -1
        for page in seq.pages:
            self._release_page(page)
        seq.pages = []
        seq.n_cached = 0
        seq.prefilled = 0
        self.stats.preemptions += 1
        self._preempted.append(seq)

    def _retire(self, seq: _Sequence) -> None:
        assert seq.slot >= 0 and self._slots[seq.slot] is seq, (
            "retiring a sequence that does not own its slot"
        )
        self._slots[seq.slot] = None
        seq.slot = -1
        generated = seq.generated
        if generated and generated[-1] == self.tokenizer.eos_id:
            generated = generated[:-1]
        text = self.tokenizer.decode(generated)

        if self.prefix_cache is not None:
            # share this sequence's full prompt+completion pages
            all_tokens = seq.all_tokens()
            full = len(all_tokens) // self.page_size
            self.prefix_cache.insert(all_tokens[: full * self.page_size],
                                     seq.pages[:full])
        for page in seq.pages:
            self._release_page(page)
        seq.pages = []

        usage = {
            "prompt_tokens": len(seq.prompt),
            "completion_tokens": len(generated),
            "cached_tokens": seq.n_cached,
        }
        self.stats.completed += 1
        if not seq.future.done():
            seq.future.set_result(GenerateResult(text=text, token_usage=usage))
