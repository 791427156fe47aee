"""Continuous-batching scheduler with KV oversubscription.

New first-class component vs the reference (SURVEY.md section 2.6): the
reference assumes vLLM supplies scheduling. Here the scheduler drives the
capacity-expansion story: it keeps more live sequences than HBM can hold,
round-robins decode across them in *groups* of up to `max_batch_size`, and
exposes the upcoming rotation to the prefetch controller so host->HBM
preloads complete before a group's turn arrives (converting would-be demand
stalls into prefetch hits — the whole point of the reference system).

Policy:
- admission: FIFO while sequence slots and total KV capacity remain
- prefill: one chunk per step per new request (chunked prefill)
- decode: least-recently-scheduled first (fair round-robin); sequences whose
  blocks are HBM-resident sort before ones needing fetches at equal age, so
  prefetched groups run while others stream in
- preemption: on allocation failure the youngest sequence is preempted back
  to the queue and its blocks freed (OOM backpressure the reference lacks)
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from cxl_speckv_tpu.config import EngineConfig
from cxl_speckv_tpu.core.stats import Statistics
from cxl_speckv_tpu.engine.request import Request, RequestState
from cxl_speckv_tpu.runtime.kv_cache import TieredKVCache


@dataclass
class SchedulerStatistics(Statistics):
    steps: int = 0
    prefill_chunks: int = 0
    decode_batches: int = 0
    decode_tokens: int = 0
    preemptions: int = 0
    admissions: int = 0


class Scheduler:
    def __init__(self, config: EngineConfig, kvc: TieredKVCache):
        self.config = config
        self.kvc = kvc
        self.queue: deque[Request] = deque()
        self.running: dict[int, Request] = {}   # req_id -> Request (has seq_slot)
        self.stats = SchedulerStatistics()
        self._step = 0
        self._batch_ids: list[int] = []
        self._batch_started = 0
        # called with (seq_slot, block_ids) just before a sequence's blocks
        # are freed (finish or preemption) — lets auxiliary caches clean up
        self.free_seq_hook = None
        # called when admission is capacity-blocked; returns True if capacity
        # was reclaimed (engine frees idle session KV) — retried once
        self.reclaim_hook = None
        # extra committed blocks not visible in `running` (idle session KV)
        self.extra_committed = None
        # model sliding window (tokens): bounds every request's worst-case
        # live KV (out-of-window blocks retire; engine sets this)
        self.window_tokens: int | None = None
        # requests rejected at admission (can never fit, even alone) — the
        # engine drains these into clean 'oom' finishes
        self.rejected: list[Request] = []

    # -- admission -----------------------------------------------------------

    def submit(self, req: Request) -> None:
        if len(self.queue) >= self.config.max_queue:
            raise RuntimeError("request queue full")
        self.queue.append(req)

    def _block_capacity(self) -> int:
        """Conservative total logical-block capacity: with a host tier every
        block may eventually need a host slot (HBM residents keep clean host
        backing copies), so the host pool bounds it; HBM-only otherwise."""
        cc = self.kvc.config
        return cc.num_host_blocks if cc.num_host_blocks > 0 else cc.num_hbm_blocks

    def _worst_case_blocks(self, req: Request) -> int:
        """Worst-case live-block footprint of a request. A sliding window
        bounds it: out-of-window blocks retire as the sequence grows, so
        live KV never exceeds ~window tokens (+ the straddled edge block
        + the growth block), however long the generation runs."""
        bs = self.kvc.config.block_size
        total = req.context_len + len(req.prompt) + req.max_new_tokens
        if self.window_tokens is not None:
            total = min(total, self.window_tokens + 2 * bs)
        return -(-total // bs)

    def _committed_blocks(self) -> int:
        committed = sum(self._worst_case_blocks(r)
                        for r in self.running.values())
        if self.extra_committed is not None:
            committed += self.extra_committed()
        return committed

    def admit(self, max_new: int = 1) -> list[Request]:
        """Move queued requests into the running set (assign seq slots).

        Admission is capacity-gated: a request only enters once its worst-case
        block footprint fits the remaining capacity — otherwise oversubmission
        degenerates into preemption thrash (preemption stays as the
        correctness backstop, not the steady state)."""
        admitted = []
        capacity = self._block_capacity()
        committed = self._committed_blocks()
        while self.queue and len(admitted) < max_new:
            head = self.queue[0]
            need = self._worst_case_blocks(head)
            if head.seq_slot < 0 and need > capacity:
                # can never fit even alone: fail cleanly now instead of
                # livelocking in an admit -> extend-fail -> preempt cycle
                self.queue.popleft()
                self.rejected.append(head)
                continue
            if head.seq_slot >= 0:
                need = 0  # live session continuation: blocks already held
            if committed + need > capacity and (self.running or committed):
                if self.reclaim_hook is not None and self.reclaim_hook():
                    # already-admitted requests are in `running`, so a fresh
                    # recount includes them
                    committed = self._committed_blocks()
                    continue
                break
            slot = head.seq_slot if head.seq_slot >= 0 else self.kvc.add_seq()
            if slot is None:
                break
            req = self.queue.popleft()
            req.seq_slot = slot
            req.state = RequestState.PREFILLING
            self.running[req.req_id] = req
            self.stats.admissions += 1
            admitted.append(req)
            committed += need
        return admitted

    # -- selection -----------------------------------------------------------

    def prefill_candidates(self) -> list[Request]:
        return [r for r in self.running.values() if r.state == RequestState.PREFILLING]

    def _decode_order(self) -> list[Request]:
        """Fair rotation: least-recently-scheduled first; resident preferred
        at equal age."""
        decodable = [r for r in self.running.values() if r.state == RequestState.RUNNING]
        return sorted(
            decodable,
            key=lambda r: (
                r.last_scheduled_step,
                len(self.kvc.seq_nonresident_blocks(r.seq_slot)) > 0,
                r.req_id,
            ),
        )

    def decode_batch(self) -> list[Request]:
        """Pick the decode group. With sched_quantum > 1 the group is sticky:
        it keeps its slot for that many steps (unless a member finished or
        slots freed up), so prefetch for the NEXT group can overlap a whole
        quantum of decode instead of racing a per-step rotation."""
        q = max(1, self.config.sched_quantum)
        B = self.config.max_batch_size
        held = [self.running[rid] for rid in self._batch_ids
                if rid in self.running
                and self.running[rid].state == RequestState.RUNNING]
        if (q > 1 and held and len(held) == len(self._batch_ids)
                and self._step - self._batch_started < q):
            batch = held
        else:
            # cap the batch by HBM working set: every member's blocks must be
            # simultaneously resident during decode (+1 block each for growth)
            ws_cap = self.kvc.config.num_hbm_blocks - 2
            batch, ws = [], 0
            for r in self._decode_order():
                if len(batch) >= B:
                    break
                need = len(self.kvc.pool.seq(r.seq_slot).live_blocks) + 1
                if batch and ws + need > ws_cap:
                    continue
                batch.append(r)
                ws += need
            self._batch_ids = [r.req_id for r in batch]
            self._batch_started = self._step
        for r in batch:
            r.last_scheduled_step = self._step
        return batch

    def held_batch_slots(self) -> list[int]:
        """Seq slots of the decode group currently holding the batch slot
        (sticky under sched_quantum). These are the blocks whose HBM
        residency is on the decode critical path RIGHT NOW — the engine's
        prefill tick treats them as a protected residency class (the
        reference's hot/pinned eviction classes,
        `cxl_memory_manager.cpp:245-293`)."""
        return [self.running[rid].seq_slot for rid in self._batch_ids
                if rid in self.running
                and self.running[rid].state == RequestState.RUNNING]

    def upcoming_groups(self, n_groups: int, exclude: set[int]) -> list[list[int]]:
        """Future schedule (seq slots), nearest group first, for the
        prefetcher. `exclude` holds req_ids already in this step's batch."""
        order = [r for r in self._decode_order() if r.req_id not in exclude]
        B = self.config.max_batch_size
        return [
            [r.seq_slot for r in order[i : i + B]]
            for i in range(0, min(len(order), n_groups * B), B)
        ]

    # -- lifecycle -----------------------------------------------------------

    def preempt_youngest(self) -> Request | None:
        """Free the most recently admitted running sequence back to the queue."""
        victims = [r for r in self.running.values()
                   if r.state in (RequestState.RUNNING, RequestState.PREFILLING)
                   and not r.session]  # session KV is reclaimed via the
                                       # engine's idle-session path instead
        if not victims:
            return None
        victim = max(victims, key=lambda r: r.arrival_time)
        # hook runs AFTER the pool free so pool.is_live(bid) tells the spec
        # decoder whether a prefix-shared block survives in another sequence
        bids = self.kvc.pool.seq(victim.seq_slot).live_blocks
        self.kvc.free_seq(victim.seq_slot)
        if self.free_seq_hook:
            self.free_seq_hook(victim.seq_slot, bids)
        del self.running[victim.req_id]
        victim.seq_slot = -1
        victim.prefill_pos = 0
        victim.restarts += 1     # streaming readers discard the stale prefix
        victim.output.clear()
        victim.logprobs_data.clear()
        victim.prompt_logprobs_data.clear()  # prefill restarts from 0
        # latency bookkeeping restarts with the request: mixing
        # pre-preemption timestamps with post-restart tokens would corrupt
        # the TTFT/TPOT metrics the benchmark reports
        victim.token_times.clear()
        victim.first_token_time = 0.0
        victim.state = RequestState.QUEUED
        self.queue.appendleft(victim)
        self.stats.preemptions += 1
        return victim

    def finish(self, req: Request, reason: str, free: bool = True) -> None:
        req.state = RequestState.FINISHED
        req.finish_reason = reason
        if free and req.seq_slot >= 0:
            bids = self.kvc.pool.seq(req.seq_slot).live_blocks
            self.kvc.free_seq(req.seq_slot)
            if self.free_seq_hook:
                self.free_seq_hook(req.seq_slot, bids)
        elif not free:
            # session request: KV stays allocated (and demotable) for the
            # next turn; only the scheduling entry retires
            self.kvc.pin_seq(req.seq_slot, False)
        self.running.pop(req.req_id, None)

    def tick(self) -> int:
        self._step += 1
        self.stats.steps += 1
        return self._step

    @property
    def num_waiting(self) -> int:
        return len(self.queue)

    @property
    def num_running(self) -> int:
        return len(self.running)

    def get_statistics(self) -> SchedulerStatistics:
        return self.stats

    def reset_statistics(self) -> None:
        self.stats.reset()
