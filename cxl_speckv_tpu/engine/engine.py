"""The serving engine: continuous batching over the tiered, quantized,
prefetched KV cache.

Top-level facade, analog of `CXLSpecKVSystem` (`src/cxl_speckv_system.h:
17-114`) wired to a real model and scheduler. Each `step()` is one engine
iteration:

1. admit queued requests; run one prefill chunk per prefilling request
2. pick the decode batch (round-robin over the oversubscribed running set),
   demand-fetch any non-resident blocks (stall, counted), pin, decode, sample
3. retire finished requests, record metrics
4. prefetch plan for upcoming groups + adaptive depth update
5. tier maintenance (eviction to landing-zone reserve, transfer retirement)

The runtime-mutable knobs mirror the reference C API
(`speckv.h:65-66`): `set_prefetch_depth`, and `kv_dtype` is fixed per engine
instance (pool element type) as the compression scheme.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from cxl_speckv_tpu.config import SystemConfig
from cxl_speckv_tpu.core.stats import Statistics, ratio
from cxl_speckv_tpu.engine.request import Request, RequestState
from cxl_speckv_tpu.engine.sampling import sample_tokens
from cxl_speckv_tpu.engine.scheduler import Scheduler
from cxl_speckv_tpu.models.configs import LlamaConfig
from cxl_speckv_tpu.models.llama import decode_step, init_params, prefill_chunk
from cxl_speckv_tpu.ops.pallas_utils import round_up
from cxl_speckv_tpu.prefetcher.controller import PrefetchController
from cxl_speckv_tpu.prefetcher.lstm import LSTMPredictor
from cxl_speckv_tpu.runtime.kv_cache import TieredKVCache
from cxl_speckv_tpu.utils.tracing import PhaseTimer


@dataclass
class EngineOutput:
    req_id: int
    tokens: list[int]
    finish_reason: str
    ttft_ms: float
    tpot_ms: float
    session_id: int = -1


@dataclass
class Session:
    """Multi-turn conversation whose KV persists between requests.

    The engine-level realization of the reference's serving pattern: a
    request's KV pages stay in the pooled tier between accesses
    (`README.md:16-19`) and are restored (prefetched/promoted) instead of
    recomputed when the conversation returns. `live=False` means the KV was
    reclaimed under capacity pressure — the next turn transparently
    re-prefills the stored history (the HBM-only fallback)."""

    session_id: int
    seq_slot: int
    tokens: list[int] = field(default_factory=list)  # full conversation
    live: bool = True
    busy: bool = False
    last_use: float = field(default_factory=time.monotonic)
    restores: int = 0
    reprefills: int = 0


@dataclass
class EngineStatistics(Statistics):
    steps: int = 0
    requests_finished: int = 0
    tokens_generated: int = 0
    decode_time_s: float = 0.0
    prefill_time_s: float = 0.0
    overhead_time_s: float = 0.0

    def as_dict(self) -> dict:
        d = super().as_dict()
        d["decode_tokens_per_s"] = ratio(self.tokens_generated, self.decode_time_s)
        return d


class Engine:
    def __init__(self, model_config: LlamaConfig, system_config: SystemConfig,
                 params=None, *, use_pallas: bool | None = None,
                 enable_lstm: bool | None = None, seed: int = 0,
                 draft_config: LlamaConfig | None = None, draft_params=None,
                 spec_gamma: int = 4):
        system_config.validate()
        self.model_config = model_config
        self.config = system_config
        ec = system_config.engine
        max_blocks_per_seq = -(-ec.max_seq_len // system_config.cache.block_size)
        self.kvc = TieredKVCache(system_config.cache, model_config,
                                 max_seqs=ec.max_batch_size * 64,
                                 max_blocks_per_seq=max_blocks_per_seq)
        self.params = params if params is not None else init_params(
            model_config, jax.random.PRNGKey(seed))
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas

        if enable_lstm is None:
            enable_lstm = system_config.prefetch.enabled
        predictor = None
        if enable_lstm:
            pf = system_config.prefetch
            predictor = LSTMPredictor(
                model_config.vocab_size, embed_dim=pf.embed_dim,
                hidden=pf.lstm_hidden, num_layers=pf.lstm_layers,
                history_len=pf.history_len, seed=seed)
        self.eos_token_id = (ec.eos_token_id if ec.eos_token_id is not None
                             else model_config.eos_token_id)
        self.prefetcher = PrefetchController(
            system_config.prefetch, self.kvc, predictor=predictor,
            eos_token_id=self.eos_token_id)
        self.scheduler = Scheduler(ec, self.kvc)
        self.spec = None
        if draft_config is not None:
            from cxl_speckv_tpu.engine.spec import SpecDecoder
            from cxl_speckv_tpu.models.llama import init_params as _init

            if draft_params is None:
                draft_params = _init(draft_config, jax.random.PRNGKey(seed + 2))
            self.spec = SpecDecoder(draft_config, draft_params, self.kvc,
                                    gamma=spec_gamma)
            self.scheduler.free_seq_hook = self.spec.on_free_seq
        # fused rounds: migration batch + model step in one dispatch (device
        # store backend; the spec path and single-token decode still use
        # standalone migrate programs)
        self._fused_rounds = self.kvc.device_mode and self.spec is None
        self.kvc.defer_migrations = self._fused_rounds
        self.stats = EngineStatistics()
        self.timers = PhaseTimer()
        self._next_req_id = 0
        # PRNG keys are built host-side (raw threefry uint32[2]) so each
        # step costs zero extra device dispatches
        self._rng_seed = seed + 1
        self._rng_counter = 0
        self._requests: dict[int, Request] = {}
        self._sessions: dict[int, Session] = {}
        self._tpots: list[float] = []
        self.scheduler.reclaim_hook = self._reclaim_idle_session
        self.scheduler.extra_committed = self._idle_session_blocks

    # -- public API (the speckv_* C API analog) ------------------------------

    def add_request(self, prompt: list[int], max_new_tokens: int = 64,
                    temperature: float = 0.0,
                    eos_token_id: int | None = None,
                    session: bool = False) -> int:
        """Submit a request. With session=True the conversation's KV persists
        after the reply (demotable to the host tier); follow it up with
        `continue_session(req_id, ...)` to restore instead of re-prefill."""
        if not prompt:
            raise ValueError("empty prompt")
        if len(prompt) + max_new_tokens > self.config.engine.max_seq_len:
            raise ValueError("prompt + max_new_tokens exceeds max_seq_len")
        req = Request(req_id=self._next_req_id, prompt=list(prompt),
                      max_new_tokens=max_new_tokens, temperature=temperature,
                      eos_token_id=eos_token_id, session=session)
        if session:
            req.session_id = req.req_id
        self._next_req_id += 1
        self._requests[req.req_id] = req
        self.scheduler.submit(req)
        return req.req_id

    def continue_session(self, session_id: int, new_tokens: list[int],
                         max_new_tokens: int = 64,
                         temperature: float = 0.0) -> int:
        """Next conversation turn. If the session's KV is still allocated
        (HBM- or host-resident), only the new tokens are prefilled and the
        context is restored by the tiering machinery; if it was reclaimed,
        the stored history is transparently re-prefilled."""
        sess = self._sessions.get(session_id)
        if sess is None:
            raise ValueError(f"unknown session {session_id}")
        if sess.busy:
            raise ValueError(f"session {session_id} already has a turn in flight")
        if not new_tokens:
            raise ValueError("empty continuation")
        sess.busy = True
        sess.last_use = time.monotonic()
        if sess.live:
            # KV covers tokens[:-1]; feed the last reply token + new tokens
            prompt = [sess.tokens[-1]] + list(new_tokens)
            context_len = len(sess.tokens) - 1
            seq_slot = sess.seq_slot
            sess.restores += 1
        else:
            prompt = sess.tokens + list(new_tokens)
            context_len = 0
            seq_slot = -1
            sess.reprefills += 1
        total = context_len + len(prompt) + max_new_tokens
        if total > self.config.engine.max_seq_len:
            sess.busy = False
            raise ValueError("session exceeds max_seq_len")
        req = Request(req_id=self._next_req_id, prompt=prompt,
                      max_new_tokens=max_new_tokens, temperature=temperature,
                      session=True, session_id=session_id,
                      context_len=context_len)
        req.seq_slot = seq_slot
        self._next_req_id += 1
        self._requests[req.req_id] = req
        self.scheduler.submit(req)
        return req.req_id

    def get_session(self, session_id: int) -> Session:
        return self._sessions[session_id]

    def end_session(self, session_id: int) -> None:
        """Free a session's KV for good."""
        sess = self._sessions.pop(session_id)
        if sess.live:
            self._free_session_seq(sess)

    # -- session capacity management ----------------------------------------

    def _free_session_seq(self, sess: Session) -> None:
        if self.scheduler.free_seq_hook:
            self.scheduler.free_seq_hook(
                sess.seq_slot, list(self.kvc.pool.seq(sess.seq_slot).blocks))
        self.kvc.free_seq(sess.seq_slot)
        sess.live = False
        sess.seq_slot = -1

    def _idle_session_blocks(self) -> int:
        return sum(len(self.kvc.pool.seq(s.seq_slot).blocks)
                   for s in self._sessions.values() if s.live and not s.busy)

    def _make_capacity(self) -> bool:
        """Free capacity under pressure: idle session KV first (cheap — a
        later re-prefill), then preemption of the youngest non-session
        request (loses in-flight work)."""
        if self._reclaim_idle_session():
            return True
        return self.scheduler.preempt_youngest() is not None

    def _reclaim_idle_session(self) -> bool:
        """Free the least-recently-used idle session's KV (capacity
        pressure) — its next turn will re-prefill. Returns True if one was
        reclaimed."""
        idle = [s for s in self._sessions.values() if s.live and not s.busy]
        if not idle:
            return False
        victim = min(idle, key=lambda s: s.last_use)
        self._free_session_seq(victim)
        return True

    def set_prefetch_depth(self, depth: int) -> None:
        """Runtime knob, `speckv_set_prefetch_depth` analog."""
        pf = self.config.prefetch
        self.prefetcher.depth = max(pf.min_depth, min(pf.max_depth, depth))

    def generate(self, prompts: list[list[int]], max_new_tokens: int = 64,
                 temperature: float = 0.0) -> list[list[int]]:
        """Convenience batch API: submit, serve to completion, return each
        prompt's generated tokens in submission order."""
        ids = [self.add_request(p, max_new_tokens=max_new_tokens,
                                temperature=temperature) for p in prompts]
        outs = {o.req_id: o.tokens for o in self.run()}
        return [outs.get(i, []) for i in ids]

    @property
    def has_work(self) -> bool:
        return self.scheduler.num_waiting > 0 or self.scheduler.num_running > 0

    def run(self, max_steps: int = 100000) -> list[EngineOutput]:
        outs = []
        for _ in range(max_steps):
            if not self.has_work:
                break
            outs.extend(self.step())
        return outs

    # -- one engine iteration -------------------------------------------------

    def step(self) -> list[EngineOutput]:
        step_no = self.scheduler.tick()
        self.stats.steps += 1
        finished: list[EngineOutput] = []

        self.scheduler.admit(max_new=self.config.engine.max_batch_size)
        t0 = time.monotonic()
        with self.timers.phase("prefill"):
            self._prefill_tick(finished)
        t1 = time.monotonic()
        with self.timers.phase("decode"):
            batch = self._decode_tick(finished)
        t2 = time.monotonic()

        with self.timers.phase("maintain"):
            # prefetch plan for upcoming rotation + adaptive depth
            exclude = {r.req_id for r in batch}
            upcoming = self.scheduler.upcoming_groups(
                self.config.prefetch.max_depth, exclude)
            # protect the current batch's and upcoming groups' blocks from
            # proactive eviction (writebacks should target the cold tail,
            # not the blocks the prefetcher is about to need)
            live = set(self.kvc.pool.live_seqs())
            protected: set[int] = set()
            for r in batch:
                if r.seq_slot in live:
                    protected.update(self.kvc.pool.seq(r.seq_slot).blocks)
            for g in upcoming[: self.prefetcher.depth]:
                for s in g:
                    if s in live:
                        protected.update(self.kvc.pool.seq(s).blocks)
            self.kvc.protected = protected
            self.prefetcher.plan(upcoming)
            self.prefetcher.update_depth()
            self.prefetcher.maybe_train()
            # preload queued session restores (their seq is known before
            # admission — the idle-KV warm-up the reference's prefetcher
            # exists for)
            for r in list(self.scheduler.queue)[:4]:
                if r.session and r.seq_slot >= 0:
                    self.kvc.prefetch_blocks(
                        self.kvc.seq_nonresident_blocks(r.seq_slot))
            self.kvc.maintain()
        t3 = time.monotonic()
        self.stats.prefill_time_s += t1 - t0
        self.stats.decode_time_s += t2 - t1
        self.stats.overhead_time_s += t3 - t2
        return finished

    # -- prefill --------------------------------------------------------------

    def _prefill_tick(self, finished: list[EngineOutput]) -> None:
        if self.spec is None:
            return self._prefill_tick_batched(finished)
        return self._prefill_tick_serial(finished)

    def _prefill_tick_batched(self, finished: list[EngineOutput]) -> None:
        """One device dispatch prefills a chunk for up to max_batch_size
        requests at once (causal within each chunk + that lane's quantized
        pool context), with each lane's next token sampled in-graph."""
        from cxl_speckv_tpu.models.llama import prefill_batch_packed

        chunk = self.config.engine.prefill_chunk
        B = self.config.engine.max_batch_size
        bs = self.config.cache.block_size
        mb = self.kvc.pool.table.max_blocks_per_seq
        ready: list[tuple] = []  # (req, n, start)
        for req in self.scheduler.prefill_candidates():
            if len(ready) >= B:
                break
            if req.seq_slot < 0 or req.state != RequestState.PREFILLING:
                continue
            n = min(chunk, len(req.prompt) - req.prefill_pos)
            start = req.context_len + req.prefill_pos
            if -(-(start + n) // bs) > self.config.cache.num_hbm_blocks - 2:
                finished.append(self._finish_request(req, "oom"))
                req.state = RequestState.FAILED
                continue
            # cap the wave's combined working set: every selected lane's
            # context must be simultaneously HBM-resident
            need = -(-(start + n) // bs)
            ws = sum(-(-(s0 + n0) // bs) for _, n0, s0 in ready)
            if ready and ws + need > self.config.cache.num_hbm_blocks - 2:
                continue
            if not self.kvc.extend_seq(req.seq_slot, start + n):
                if not self._make_capacity():
                    finished.append(self._finish_request(req, "oom"))
                    req.state = RequestState.FAILED
                continue
            self.kvc.pin_seq(req.seq_slot, True)
            ready.append((req, n, start))
        if not ready:
            return
        if self._fused_rounds:
            self.kvc.prepare_resident([r.seq_slot for r, _, _ in ready])
        else:
            self.kvc.ensure_resident([r.seq_slot for r, _, _ in ready])

        self._rng_counter += 1
        packed = np.zeros((B, 4 + mb + chunk), np.int32)
        packed[:, 4:4 + mb] = self.kvc.guard_slot
        packed[:, 3] = self._rng_counter
        for i, (req, n, start) in enumerate(ready):
            packed[i, 0] = start
            packed[i, 1] = n
            packed[i, 2] = int(req.temperature * 1000)
            row = self.kvc.pool.table.row(req.seq_slot)
            packed[i, 4:4 + mb] = np.where(row >= 0, row, self.kvc.guard_slot)
            packed[i, 4 + mb:4 + mb + n] = req.prompt[
                req.prefill_pos : req.prefill_pos + n]
        if self._fused_rounds:
            from cxl_speckv_tpu.models.llama import prefill_round_fused

            mig, up_bids, down_bids = self.kvc.take_migration_plan()
            toks, *rest = prefill_round_fused(
                self.params, self.model_config, self.kvc.kv_dtype,
                packed, mig, *self.kvc.pools, *self.kvc.store.arrays,
                max_blocks=mb, rng_seed=self._rng_seed,
                store_ops=self.kvc.store_ops)
            self.kvc.set_pools(tuple(rest[:4]))
            self.kvc.store.set_arrays(tuple(rest[4:]))
            self.kvc.commit_migration(up_bids, down_bids)
        else:
            toks, *pools = prefill_batch_packed(
                self.params, self.model_config, self.kvc.kv_dtype,
                packed, *self.kvc.pools, max_blocks=mb, rng_seed=self._rng_seed)
            self.kvc.set_pools(tuple(pools))
        toks = np.asarray(toks)

        for i, (req, n, start) in enumerate(ready):
            blocks = self.kvc.pool.seq(req.seq_slot).blocks
            for bi in range(start // bs, (start + n - 1) // bs + 1):
                self.kvc.directory.mark_dirty(blocks[bi])
            self.kvc.pin_seq(req.seq_slot, False)
            req.prefill_pos += n
            self.prefetcher.observe_tokens(
                req.seq_slot, req.prompt[req.prefill_pos - n : req.prefill_pos])
            self.scheduler.stats.prefill_chunks += 1
            if req.done_prefill:
                self._record_token(req, int(toks[i]), first=True)
                req.state = RequestState.RUNNING
                out = self._maybe_finish(req)
                if out is not None:
                    finished.append(out)

    def _prefill_tick_serial(self, finished: list[EngineOutput]) -> None:
        chunk = self.config.engine.prefill_chunk
        for req in self.scheduler.prefill_candidates():
            if req.seq_slot < 0 or req.state != RequestState.PREFILLING:
                continue  # preempted by another request's allocation this tick
            remaining = len(req.prompt) - req.prefill_pos
            n = min(chunk, remaining)
            start = req.context_len + req.prefill_pos
            bs_ = self.config.cache.block_size
            # prefill attends over the sequence's full context, which must be
            # HBM-resident: a single sequence cannot exceed the HBM pool
            # (streamed host-context prefill is not supported yet)
            if -(-(start + n) // bs_) > self.config.cache.num_hbm_blocks - 2:
                finished.append(self._finish_request(req, "oom"))
                req.state = RequestState.FAILED
                continue
            if not self.kvc.extend_seq(req.seq_slot, start + n):
                if not self._make_capacity():
                    finished.append(self._finish_request(req, "oom"))
                    req.state = RequestState.FAILED
                continue
            # pin while the chunk runs so residency can't be evicted from
            # under the context gather
            self.kvc.pin_seq(req.seq_slot, True)
            self.kvc.ensure_resident([req.seq_slot])
            # pad every chunk to the full prefill_chunk size: exactly ONE
            # prefill program per engine (first execution of each distinct
            # program costs tens of seconds on remote TPU runtimes; the
            # padded compute is masked out and cheap by comparison). All
            # inputs ride one packed int32 array (single H2D per chunk) and
            # the first-token sample is fused in-graph.
            from cxl_speckv_tpu.models.llama import prefill_chunk_packed

            mb = self.kvc.pool.table.max_blocks_per_seq
            self._rng_counter += 1
            packed = np.zeros(4 + mb + chunk, np.int32)
            packed[0] = start
            packed[1] = n
            packed[2] = int(req.temperature * 1000)
            packed[3] = self._rng_counter
            row = self.kvc.pool.table.row(req.seq_slot)
            packed[4:4 + mb] = np.where(row >= 0, row, self.kvc.guard_slot)
            packed[4 + mb:4 + mb + n] = req.prompt[
                req.prefill_pos : req.prefill_pos + n]
            tok_dev, *pools = prefill_chunk_packed(
                self.params, self.model_config, self.kvc.kv_dtype,
                packed, *self.kvc.pools, max_blocks=mb,
                rng_seed=self._rng_seed)
            self.kvc.set_pools(tuple(pools))
            toks = packed[4 + mb:]  # for the draft-model prefill below
            bs = self.config.cache.block_size
            blocks = self.kvc.pool.seq(req.seq_slot).blocks
            for bi in range(start // bs, (start + n - 1) // bs + 1):
                self.kvc.directory.mark_dirty(blocks[bi])
            if self.spec is not None:
                self.spec.prefill(req.seq_slot, jnp.asarray(toks), start, n)
            self.kvc.pin_seq(req.seq_slot, False)
            req.prefill_pos += n
            self.prefetcher.observe_tokens(
                req.seq_slot, req.prompt[req.prefill_pos - n : req.prefill_pos])
            self.scheduler.stats.prefill_chunks += 1
            if req.done_prefill:
                # the fused in-graph sample produced the first token
                tok = int(np.asarray(tok_dev))
                self._record_token(req, tok, first=True)
                req.state = RequestState.RUNNING
                out = self._maybe_finish(req)
                if out is not None:
                    finished.append(out)

    # -- decode ---------------------------------------------------------------

    def _decode_tick(self, finished: list[EngineOutput]) -> list[Request]:
        batch = self.scheduler.decode_batch()
        if not batch:
            return batch
        # speculative path: all-greedy batches with a draft model attached
        if self.spec is not None and all(r.temperature <= 0.0 for r in batch):
            return self._spec_decode_tick(batch, finished)
        if self.config.engine.decode_horizon > 1:
            return self._multi_decode_tick(batch, finished)
        B = self.config.engine.max_batch_size
        slots = [r.seq_slot for r in batch]
        # pin before fetching so eviction can't cannibalize the batch itself
        for s in slots:
            self.kvc.pin_seq(s, True)
        # record accesses BEFORE the demand fetch so misses are counted as
        # misses (touching after ensure_resident would report every demand
        # fetch as a hit)
        for s in slots:
            self.kvc.touch_seq(s)
        self.kvc.ensure_resident(slots)

        guard = self.kvc.guard_slot
        max_blocks = self.kvc.pool.table.max_blocks_per_seq
        tokens = np.zeros(B, np.int32)
        positions = np.zeros(B, np.int32)
        lens = np.ones(B, np.int32)
        temps = np.zeros(B, np.float32)
        btab = np.full((B, max_blocks), guard, np.int32)
        for i, r in enumerate(batch):
            # capacity for the KV row of the token being fed this step
            # (the previously sampled token, at position num_tokens - 1)
            while r.seq_slot >= 0 and not self.kvc.extend_seq(r.seq_slot, r.num_tokens):
                if not self._make_capacity():
                    raise RuntimeError("KV capacity exhausted with nothing to preempt")
            if r.seq_slot >= 0:
                self.kvc.pin_seq(r.seq_slot, True)
        # preemption may have evicted a batch member — drop dead lanes
        batch = [r for r in batch if r.seq_slot >= 0]
        for i, r in enumerate(batch):
            tokens[i] = r.output[-1]
            positions[i] = r.num_tokens - 1
            lens[i] = r.num_tokens
            temps[i] = r.temperature
            row = self.kvc.pool.table.row(r.seq_slot)
            btab[i] = np.where(row >= 0, row, guard)
        if not batch:
            return batch

        logits, *pools = decode_step(
            self.params, self.model_config, self.kvc.kv_dtype,
            tokens, positions, *self.kvc.pools,
            btab, lens, use_pallas=self.use_pallas)
        self.kvc.set_pools(tuple(pools))

        sub = self._next_key()
        sampled = np.asarray(sample_tokens(logits, jnp.asarray(temps), sub))
        bs = self.config.cache.block_size
        for i, r in enumerate(batch):
            self.kvc.directory.mark_dirty(
                self.kvc.pool.seq(r.seq_slot).blocks[positions[i] // bs])
            self._record_token(r, int(sampled[i]))
            out = self._maybe_finish(r)
            if out is not None:
                finished.append(out)
        for r in batch:
            if r.state == RequestState.RUNNING:
                self.kvc.pin_seq(r.seq_slot, False)
        self.scheduler.stats.decode_batches += 1
        self.scheduler.stats.decode_tokens += len(batch)
        return batch

    def _multi_decode_tick(self, batch: list[Request],
                           finished: list[EngineOutput]) -> list[Request]:
        """Fused multi-token decode: one dispatch, `decode_horizon` tokens."""
        from cxl_speckv_tpu.models.llama import decode_multi

        h = self.config.engine.decode_horizon
        B = self.config.engine.max_batch_size
        bs = self.config.cache.block_size
        max_tokens = self.kvc.pool.table.max_blocks_per_seq * bs
        slots = [r.seq_slot for r in batch]
        for s in slots:
            self.kvc.pin_seq(s, True)
        for s in slots:
            self.kvc.touch_seq(s)
        if self._fused_rounds:
            self.kvc.prepare_resident(slots)
        else:
            self.kvc.ensure_resident(slots)

        for r in batch:
            want = min(r.num_tokens + h - 1, max_tokens)
            while r.seq_slot >= 0 and not self.kvc.extend_seq(r.seq_slot, want):
                if not self._make_capacity():
                    raise RuntimeError("KV capacity exhausted with nothing to preempt")
            if r.seq_slot >= 0:
                # pin immediately: blocks born in this extend must not be
                # evictable while the NEXT member's extend makes room
                self.kvc.pin_seq(r.seq_slot, True)
        batch = [r for r in batch if r.seq_slot >= 0]
        if not batch:
            return batch

        guard = self.kvc.guard_slot
        mb = self.kvc.pool.table.max_blocks_per_seq
        # ONE packed int32 array carries every per-round input (single H2D)
        packed = np.full((B, mb + 4), guard, np.int32)
        packed[:, :4] = 0
        self._rng_counter += 1
        packed[:, 3] = self._rng_counter
        for i, r in enumerate(batch):
            packed[i, 0] = r.output[-1]
            packed[i, 1] = r.num_tokens - 1
            packed[i, 2] = int(r.temperature * 1000)
            row = self.kvc.pool.table.row(r.seq_slot)
            packed[i, 4:] = np.where(row >= 0, row, guard)

        if self._fused_rounds:
            from cxl_speckv_tpu.models.llama import decode_round_fused

            mig, up_bids, down_bids = self.kvc.take_migration_plan()
            toks, *rest = decode_round_fused(
                self.params, self.model_config, self.kvc.kv_dtype,
                packed, mig, *self.kvc.pools, *self.kvc.store.arrays,
                horizon=h, use_pallas=self.use_pallas,
                rng_seed=self._rng_seed, store_ops=self.kvc.store_ops)
            self.kvc.set_pools(tuple(rest[:4]))
            self.kvc.store.set_arrays(tuple(rest[4:]))
            self.kvc.commit_migration(up_bids, down_bids)
        else:
            from cxl_speckv_tpu.models.llama import decode_multi_packed

            toks, *pools = decode_multi_packed(
                self.params, self.model_config, self.kvc.kv_dtype,
                packed, *self.kvc.pools,
                horizon=h, use_pallas=self.use_pallas, rng_seed=self._rng_seed)
            self.kvc.set_pools(tuple(pools))
        toks = np.asarray(toks)

        for i, r in enumerate(batch):
            blocks = self.kvc.pool.seq(r.seq_slot).blocks
            pos0 = int(packed[i, 1])
            lo, hi = pos0 // bs, min((pos0 + h - 1) // bs, len(blocks) - 1)
            for bi in range(lo, hi + 1):
                self.kvc.directory.mark_dirty(blocks[bi])
            for j in range(h):
                if r.state != RequestState.RUNNING:
                    break
                self._record_token(r, int(toks[i, j]))
                out = self._maybe_finish(r)
                if out is not None:
                    finished.append(out)
        for r in batch:
            if r.state == RequestState.RUNNING:
                self.kvc.pin_seq(r.seq_slot, False)
        self.scheduler.stats.decode_batches += 1
        self.scheduler.stats.decode_tokens += sum(
            min(h, len(r.output)) for r in batch)
        return batch

    def _spec_decode_tick(self, batch: list[Request],
                          finished: list[EngineOutput]) -> list[Request]:
        """Draft-propose + verify + greedy-accept one round for the batch."""
        from cxl_speckv_tpu.models.llama import verify_step

        gamma = self.spec.gamma
        B = self.config.engine.max_batch_size
        slots = [r.seq_slot for r in batch]
        for s in slots:
            self.kvc.pin_seq(s, True)
        # record accesses BEFORE the demand fetch so misses are counted as
        # misses (touching after ensure_resident would report every demand
        # fetch as a hit)
        for s in slots:
            self.kvc.touch_seq(s)
        self.kvc.ensure_resident(slots)

        max_tokens = self.kvc.pool.table.max_blocks_per_seq * \
            self.config.cache.block_size
        for r in batch:
            # capacity for verify appends at positions n-1 .. n-1+gamma,
            # clamped to table capacity (a lane within gamma of the cap
            # writes fewer speculative rows; overshoot positions past its
            # final length are never read)
            while r.seq_slot >= 0 and not self.kvc.extend_seq(
                    r.seq_slot, min(r.num_tokens + gamma, max_tokens)):
                if not self._make_capacity():
                    raise RuntimeError("KV capacity exhausted with nothing to preempt")
            if r.seq_slot >= 0:
                self.kvc.pin_seq(r.seq_slot, True)
                self.spec.sync_seq(r.seq_slot)
        batch = [r for r in batch if r.seq_slot >= 0]
        if not batch:
            return batch

        guard = self.kvc.guard_slot
        mb = self.kvc.pool.table.max_blocks_per_seq
        last = np.zeros(B, np.int32)
        positions = np.zeros(B, np.int32)
        active = np.zeros(B, bool)
        ttab = np.full((B, mb), guard, np.int32)
        dtab = np.full((B, mb), self.spec.guard_slot, np.int32)
        for i, r in enumerate(batch):
            last[i] = r.output[-1]
            positions[i] = r.num_tokens - 1
            active[i] = True
            row = self.kvc.pool.table.row(r.seq_slot)
            ttab[i] = np.where(row >= 0, row, guard)
            dtab[i] = self.spec.table[r.seq_slot]

        drafts = self.spec.propose(last, positions, dtab, active)
        verify_tokens = np.concatenate([last[:, None], drafts], axis=1)  # [B, g+1]
        logits, *pools = verify_step(
            self.params, self.model_config, self.kvc.kv_dtype,
            jnp.asarray(verify_tokens), jnp.asarray(positions),
            *self.kvc.pools, jnp.asarray(ttab), jnp.asarray(active))
        self.kvc.set_pools(tuple(pools))

        emitted, n_acc = self.spec.accept_greedy(drafts, np.asarray(logits), active)
        bs = self.config.cache.block_size
        for i, r in enumerate(batch):
            blocks = self.kvc.pool.seq(r.seq_slot).blocks
            # appended KV covers positions n-1 .. n-1+accepted
            for bi in range(int(positions[i]) // bs,
                            (int(positions[i]) + int(n_acc[i])) // bs + 1):
                if bi < len(blocks):
                    self.kvc.directory.mark_dirty(blocks[bi])
            for tok in emitted[i]:
                if r.state != RequestState.RUNNING:
                    break
                self._record_token(r, tok)
                out = self._maybe_finish(r)
                if out is not None:
                    finished.append(out)
        for r in batch:
            if r.state == RequestState.RUNNING:
                self.kvc.pin_seq(r.seq_slot, False)
        self.scheduler.stats.decode_batches += 1
        self.scheduler.stats.decode_tokens += sum(len(e) for e in emitted)
        return batch

    # -- helpers --------------------------------------------------------------

    def _next_key(self) -> np.ndarray:
        self._rng_counter += 1
        return np.array([self._rng_seed, self._rng_counter], dtype=np.uint32)

    def _record_token(self, req: Request, tok: int, first: bool = False) -> None:
        now = time.monotonic()
        if first or not req.first_token_time:
            req.first_token_time = now
        req.token_times.append(now)
        req.output.append(tok)
        self.stats.tokens_generated += 1
        self.prefetcher.observe_tokens(req.seq_slot, [tok])

    def _maybe_finish(self, req: Request) -> EngineOutput | None:
        eos = req.eos_token_id if req.eos_token_id is not None else self.eos_token_id
        reason = ""
        if req.output and req.output[-1] == eos:
            reason = "eos"
        elif len(req.output) >= req.max_new_tokens:
            reason = "length"
        if not reason:
            return None
        return self._finish_request(req, reason)

    def _finish_request(self, req: Request, reason: str) -> EngineOutput:
        req.finish_time = time.monotonic()
        self.prefetcher.forget_seq(req.seq_slot)
        keep = req.session and reason != "oom" and req.seq_slot >= 0
        if keep:
            sid = req.session_id
            sess = self._sessions.get(sid)
            if sess is None:
                sess = Session(session_id=sid, seq_slot=req.seq_slot)
                self._sessions[sid] = sess
            if req.context_len > 0:
                # prompt[0] was the previous reply's last token, already stored
                sess.tokens.extend(req.prompt[1:] + req.output)
            else:
                sess.tokens = list(req.prompt) + req.output
            sess.seq_slot = req.seq_slot
            sess.live = True
            sess.busy = False
            sess.last_use = time.monotonic()
        elif req.session and req.session_id in self._sessions:
            self._sessions[req.session_id].busy = False
        self.scheduler.finish(req, reason, free=not keep)
        self.stats.requests_finished += 1
        if req.tpot_ms > 0:
            self._tpots.append(req.tpot_ms)
        return EngineOutput(req.req_id, list(req.output), reason,
                            req.ttft_ms, req.tpot_ms, req.session_id)

    # -- statistics (the aggregated SystemStatistics analog) ------------------

    def get_statistics(self) -> dict:
        eng = self.stats.as_dict()
        tp = sorted(self._tpots)
        eng["p50_tpot_ms"] = tp[len(tp) // 2] if tp else 0.0
        eng["p95_tpot_ms"] = tp[min(len(tp) - 1, int(len(tp) * 0.95))] if tp else 0.0
        return {
            "engine": eng,
            **({"spec": self.spec.get_statistics().as_dict()} if self.spec else {}),
            "phases": self.timers.summary(),
            "scheduler": self.scheduler.get_statistics().as_dict(),
            "prefetch": self.prefetcher.get_statistics().as_dict(),
            "prefetch_depth": self.prefetcher.depth,
            **self.kvc.get_statistics(),
        }

    def reset_statistics(self) -> None:
        self.stats.reset()
        self.scheduler.reset_statistics()
        self.prefetcher.reset_statistics()
        self.kvc.reset_statistics()
