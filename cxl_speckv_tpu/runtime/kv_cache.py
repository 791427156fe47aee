"""TieredKVCache — the top-level memory system facade.

Analog of the reference `CXLSpecKVSystem` + `CXLMemoryAllocator` wiring
(`src/cxl_speckv_system.cpp:21-37`, `src/integration/memory_allocator.cpp:
16-43`): owns the device pools, the host-tier store, the residency
directory, the per-sequence block pool, and the migration machinery, and
exposes the operations the serving engine needs:

- `extend_seq` / `free_seq`: capacity allocation with OOM backpressure
- `ensure_resident`: demand-fetch for scheduled sequences (the synchronous
  `sync_fetch_page` slow path, `host/src/speckv_allocator.cpp:115-138` —
  counted as stall so the prefetcher's value is measurable)
- `prefetch_blocks`: asynchronous promote (the prefetch DMA path)
- `maintain`: eviction to keep the prefetch landing zone free + migration
  dispatch (the background tier management)

Two host-tier backends (CacheConfig.host_store_backend):

- "device" (default): the pooled tier lives in pinned-host device memory
  and migrations are in-graph DMA batches that complete at dispatch
  (`runtime/hoststore.py`) — block data never crosses the host process.
- "numpy": pageable host-process store with background-staged H2D and
  polled D2H (`runtime/transfer.py`) — the fallback for runtimes without
  host-memory-space support.

Device pool layout (per layer, all layers stacked):
    k_pools [L, hbm_slots+1, D/pack, Hkv*block_size]  (TRANSPOSED "kT", r3:
      MXU-native QK matmul — see ops/paged_attention.py)
    v_pools [L, hbm_slots+1, Hkv, block_size, D/pack]
      (one extra guard slot so padded scatters can target it)
    k_scales/v_scales [L, hbm_slots+1, 1, Hkv*block_size] (flat, kT-order)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cxl_speckv_tpu.config import CacheConfig, KVDtype
from cxl_speckv_tpu.core.block_pool import BlockPool
from cxl_speckv_tpu.core.directory import BlockState, ResidencyDirectory
from cxl_speckv_tpu.core.stats import Statistics
from cxl_speckv_tpu.models.configs import LlamaConfig
from cxl_speckv_tpu.ops.quant import kv_storage_dtype
from cxl_speckv_tpu.runtime.hoststore import (
    MIGRATE_BATCH,
    DeviceHostStore,
    StoreOps,
    migrate_program,
    pad_migration,
    single_device_store_ops,
)
from cxl_speckv_tpu.runtime.transfer import (
    HostStore,
    MigrationPlanner,
    TransferEngine,
)


@dataclass
class CacheRuntimeStatistics(Statistics):
    demand_fetch_events: int = 0     # scheduler had to stall for a block
    demand_fetch_blocks: int = 0
    maintain_demotes: int = 0
    migrate_dispatches: int = 0      # device-backend migrate programs issued
    window_retired_blocks: int = 0   # blocks freed by sliding-window retirement
    prefix_hit_blocks: int = 0       # prompt blocks reused via prefix cache
    prefix_tokens_reused: int = 0    # prompt tokens NOT re-prefilled


class TieredKVCache:
    def __init__(self, cache_config: CacheConfig, model_config: LlamaConfig,
                 max_seqs: int, max_blocks_per_seq: int, device_put=None,
                 native: bool | None = None, store_ops: StoreOps | None = None):
        cache_config.validate()
        self.config = cache_config
        self.model_config = model_config
        self.kv_dtype = cache_config.kv_dtype
        # directory backend: pure-Python or the C++ runtime (identical
        # semantics, tests run both); SPECKV_NATIVE=1 selects native
        if native is None:
            import os
            native = os.environ.get("SPECKV_NATIVE") == "1"
        if native:
            from cxl_speckv_tpu.native import (
                NativeBlockPool,
                NativeResidencyDirectory,
            )
            self.directory = NativeResidencyDirectory(cache_config)
            self.pool = NativeBlockPool(cache_config, self.directory,
                                        max_seqs, max_blocks_per_seq)
        else:
            self.directory = ResidencyDirectory(cache_config)
            self.pool = BlockPool(cache_config, self.directory, max_seqs,
                                  max_blocks_per_seq)

        c = model_config
        pack = 2 if self.kv_dtype == KVDtype.INT4 else 1
        dp = c.head_dim // pack
        elem = kv_storage_dtype(self.kv_dtype)
        S = cache_config.num_hbm_blocks + 1  # +1 guard slot for dropped scatters
        self._put = device_put or (lambda x, role="v": jax.device_put(x))
        self._injected_store_ops = store_ops
        self._device_mode = cache_config.host_store_backend == "device"
        self._prefix_map: dict[bytes, int] = {}
        self._alloc_storage(self.kv_dtype)
        # blocks the scheduler expects to need soon (current + upcoming decode
        # groups): eviction takes them only as a last resort, so proactive
        # writebacks don't fight the prefetcher over the same blocks
        self.protected: set[int] = set()
        # r5 residency classes (VERDICT r4 #3): blocks of the HELD decode
        # group — the sequences decoding RIGHT NOW. Evicting one puts a
        # demand fetch on the decode critical path at the very next round,
        # so eviction takes these strictly after every other candidate
        # (including `protected`), and the engine's prefill tick sizes its
        # waves to the HBM this class does not occupy. Analog of the
        # reference's hot/pinned eviction classes
        # (`cxl_memory_manager.cpp:245-293`).
        self.decode_hot: set[int] = set()
        # device backend only: when True, maintain() leaves queued migrations
        # for the engine's next fused round dispatch instead of issuing a
        # standalone migrate program (set by engines using fused rounds)
        self.defer_migrations = False
        self.stats = CacheRuntimeStatistics()

    def _alloc_storage(self, kv_dtype: KVDtype) -> None:
        """(Re)allocate pool + store arrays for `kv_dtype`'s storage width.
        Directory/table metadata is width-agnostic and untouched."""
        c = self.model_config
        cache_config = self.config
        self.kv_dtype = kv_dtype
        pack = 2 if kv_dtype == KVDtype.INT4 else 1
        dp = c.head_dim // pack
        elem = kv_storage_dtype(kv_dtype)
        S = cache_config.num_hbm_blocks + 1
        put = self._put
        # K is stored TRANSPOSED ("kT", r3): head_dim on sublanes, head-major
        # token columns on lanes — both attention matmuls become MXU-native
        # contractions (ops/paged_attention.py header). V stays token-major.
        kt_shape = (c.num_layers, S, dp,
                    c.num_kv_heads * cache_config.block_size)
        kv_shape = (c.num_layers, S, c.num_kv_heads, cache_config.block_size, dp)
        # scales are FLAT head-major columns matching kT ([1, Hkv*bs] per
        # slot): kernels read per-column scale vectors as natural tiles
        sc_shape = (c.num_layers, S, 1,
                    c.num_kv_heads * cache_config.block_size)
        self.k_pools = put(jnp.zeros(kt_shape, elem), "kt")
        self.v_pools = put(jnp.zeros(kv_shape, elem), "v")
        self.k_scales = put(jnp.ones(sc_shape, jnp.float32), "sc")
        self.v_scales = put(jnp.ones(sc_shape, jnp.float32), "sc")

        if self._device_mode:
            self.store_ops = self._injected_store_ops or single_device_store_ops()
            self.store = DeviceHostStore(
                cache_config.num_host_blocks, c.num_layers,
                cache_config.block_size, c.num_kv_heads, dp, elem,
                self.store_ops)
            self.host = None
            self.transfer = MigrationPlanner(self.store.bytes_per_block)
        else:
            self.host = HostStore(
                cache_config.num_host_blocks, c.num_layers,
                cache_config.block_size, c.num_kv_heads, dp, np.dtype(elem))
            self.store = None
            self.transfer = TransferEngine(self.host)

    def rebuild_storage(self, kv_dtype: KVDtype) -> None:
        """Cross-WIDTH scheme switch (e.g. INT8 -> INT4 or -> BF16):
        reallocate pool + store arrays in the new storage width. Only legal
        when NO block is live — bytes cannot be reinterpreted across widths
        (same-width schemes switch live via the engine's `set_kv_dtype`;
        this is the idle complement that spans the full scheme set, the
        analog of the reference knob's FP16 <-> INT8_DELTA_RLE span,
        `speckv.h:59-63`). Directory metadata survives; the prefix cache
        clears (its blocks were freed with the last live sequence)."""
        d = self.directory
        if (d.hbm_free != self.config.num_hbm_blocks
                or d.host_free != self.config.num_host_blocks):
            raise ValueError(
                "cross-width scheme switch requires an idle cache "
                f"(live blocks: hbm {self.config.num_hbm_blocks - d.hbm_free}, "
                f"host {self.config.num_host_blocks - d.host_free})")
        self._prefix_map.clear()
        self.config.kv_dtype = kv_dtype
        self._alloc_storage(kv_dtype)

    @property
    def device_mode(self) -> bool:
        return self._device_mode

    # -- pools plumbing (donation-safe single ownership) --------------------

    @property
    def pools(self):
        return (self.k_pools, self.v_pools, self.k_scales, self.v_scales)

    def set_pools(self, pools) -> None:
        self.k_pools, self.v_pools, self.k_scales, self.v_scales = pools

    @property
    def guard_slot(self) -> int:
        return self.config.num_hbm_blocks

    # -- device-backend migration dispatch ----------------------------------

    def dispatch_migrations(self, limit_batches: int | None = None) -> int:
        """Dispatch queued migrations as migrate programs (device backend).
        Each dispatch completes its batch (dataflow ordering — see
        hoststore.py). Returns blocks moved."""
        assert self._device_mode
        moved = 0
        batches = 0
        while self.transfer.queued:
            if limit_batches is not None and batches >= limit_batches:
                break
            ups, downs, up_bids, down_bids = self.transfer.take_plan(MIGRATE_BATCH)
            mig = pad_migration(ups, downs, self.guard_slot,
                                self.store.guard_slot)
            out = migrate_program(*self.pools, *self.store.arrays,
                                  mig, ops=self.store_ops)
            self.set_pools(out[:4])
            self.store.set_arrays(out[4:])
            self.transfer.commit(up_bids, down_bids, self.directory)
            moved += len(up_bids) + len(down_bids)
            batches += 1
            self.stats.migrate_dispatches += 1
        return moved

    # -- sequence capacity --------------------------------------------------

    def add_seq(self) -> int | None:
        return self.pool.add_seq()

    def extend_seq(self, seq_slot: int, new_total_tokens: int) -> bool:
        """Grow; on HBM pressure, evict cold blocks first. False = true OOM."""
        need = self.pool.blocks_needed(seq_slot, new_total_tokens)
        if need > self.directory.hbm_free:
            self._evict(need - self.directory.hbm_free)
            if self._device_mode:
                # demotes complete at dispatch — slots free immediately
                self.dispatch_migrations()
            elif need > self.directory.hbm_free:
                # only free-demotions take effect synchronously; dirty
                # writebacks must be flushed and completed first
                self.set_pools(self.transfer.flush(self.pools, self.directory))
                self.transfer.poll(self.directory, wait=True)
        return self.pool.extend(seq_slot, new_total_tokens)

    def free_seq(self, seq_slot: int) -> None:
        self.pool.free_seq(seq_slot)

    # -- prefix caching ------------------------------------------------------
    #
    # Content-addressed reuse of FULL prompt-prefix blocks (the
    # shared-system-prompt serving win): block i's key is a chained
    # blake2b over (scheme, tokens of blocks 0..i), so only true prefixes
    # (aligned at position 0 — RoPE bakes absolute positions into K) can
    # match. Matched blocks are claimed via BlockPool.share_block
    # (refcounted); entries whose block died validate lazily via
    # `pool.is_live` (bids are never reused) and are pruned on lookup.

    def _prefix_keys(self, prompt, scheme, upto_blocks: int) -> list[bytes]:
        import hashlib
        bs = self.config.block_size
        keys = []
        digest = hashlib.blake2b(repr(scheme).encode(), digest_size=16).digest()
        for i in range(upto_blocks):
            h = hashlib.blake2b(digest, digest_size=16)
            h.update(np.asarray(prompt[i * bs:(i + 1) * bs],
                                np.int32).tobytes())
            digest = h.digest()
            keys.append(digest)
        return keys

    def match_prefix(self, prompt: list[int], scheme) -> tuple[int, list[int]]:
        """Longest cached full-block prefix of `prompt` under `scheme`.
        Returns (matched_tokens, bids); at least the prompt's last token is
        always left to recompute (its logits seed generation)."""
        if not getattr(self.config, "enable_prefix_cache", True):
            return 0, []
        bs = self.config.block_size
        nb = (len(prompt) - 1) // bs
        bids: list[int] = []
        for key in self._prefix_keys(prompt, scheme, nb):
            bid = self._prefix_map.get(key)
            if bid is None or not self.pool.is_live(bid):
                if bid is not None:
                    self._prefix_map.pop(key, None)
                break
            bids.append(bid)
        return len(bids) * bs, bids

    def claim_prefix(self, seq_slot: int, bids: list[int]) -> None:
        for bid in bids:
            self.pool.share_block(seq_slot, bid)
        self.stats.prefix_hit_blocks += len(bids)
        self.stats.prefix_tokens_reused += len(bids) * self.config.block_size

    def register_prefix(self, seq_slot: int, prompt: list[int],
                        prefilled_tokens: int, scheme) -> None:
        """Publish a sequence's completed full prompt blocks for reuse.
        First live writer wins (claimants then share that block)."""
        if not getattr(self.config, "enable_prefix_cache", True):
            return
        bs = self.config.block_size
        nb = min(prefilled_tokens // bs, (len(prompt) - 1) // bs)
        if nb <= 0:
            return
        blocks = self.pool.seq(seq_slot).blocks
        for i, key in enumerate(self._prefix_keys(prompt, scheme, nb)):
            bid = blocks[i] if i < len(blocks) else None
            if bid is None:
                continue
            cur = self._prefix_map.get(key)
            if cur is None or not self.pool.is_live(cur):
                self._prefix_map[key] = bid
        # lazy prune: stale entries (dead blocks) accumulate only until the
        # map outgrows the pool several times over
        if len(self._prefix_map) > 8 * self.config.total_blocks:
            self._prefix_map = {k: b for k, b in self._prefix_map.items()
                                if self.pool.is_live(b)}

    def retire_out_of_window(self, seq_slot: int,
                             first_live_block: int) -> list[tuple[int, int]]:
        """Free a sequence's leading blocks once a sliding attention window
        has moved past them (the Mistral-family rolling KV buffer) — the
        attention kernels never address blocks below
        `(seq_len - window) // block_size` (`ops/paged_attention.py` index
        maps), so their slots return to the pool immediately. Returns the
        freed (block_idx, bid) pairs for dependent caches (spec draft)."""
        freed = self.pool.retire_below(seq_slot, first_live_block)
        self.stats.window_retired_blocks += len(freed)
        return freed

    # -- residency management ----------------------------------------------

    def seq_nonresident_blocks(self, seq_slot: int) -> list[int]:
        return [
            bid for bid in self.pool.seq(seq_slot).live_blocks
            if self.directory.entry(bid).state == BlockState.HOST
        ]

    def touch_seq(self, seq_slot: int) -> None:
        """Record accesses for every block of a scheduled sequence (hit-rate
        accounting — each decode step reads all blocks of the sequence)."""
        for bid in self.pool.seq(seq_slot).live_blocks:
            self.directory.access(bid)

    def ensure_resident(self, seq_slots: list[int]) -> int:
        """Demand-fetch every non-resident block of the given sequences.
        Returns blocks fetched. In the device backend this is one migrate
        dispatch (no host-process stall); in the numpy backend it blocks on
        the staged H2D (the sync_fetch_page analog)."""
        if self._device_mode:
            return self._ensure_resident_device(seq_slots)
        return self._ensure_resident_numpy(seq_slots)

    def _ensure_resident_device(self, seq_slots: list[int]) -> int:
        fetched = self.prepare_resident(seq_slots)
        # dispatch only when promotes are waiting (the batch needs them
        # NOW); queued writebacks ride along free in the same program, but
        # a down-only queue defers to maintain()'s batching policy instead
        # of burning a ~90ms migrate program on a few writeback lanes
        if self.transfer.pending_up:
            self.dispatch_migrations()
        return fetched

    def prepare_resident(self, seq_slots: list[int]) -> int:
        """Device backend: enqueue demand promotes (and cancel queued
        writebacks) for the given sequences WITHOUT dispatching — the caller
        folds them into its fused round via `take_migration_plan`. Block
        table rows are synced to the reserved target slots immediately."""
        assert self._device_mode
        fetched = 0
        for s in seq_slots:
            for b in self.pool.seq(s).live_blocks:
                if self.directory.entry(b).state == BlockState.IN_FLIGHT_DOWN:
                    # queued writeback: always cancellable pre-dispatch
                    self.transfer.cancel_queued_demote(b, self.directory)
            for bid in self.seq_nonresident_blocks(s):
                while self.directory.hbm_free == 0:
                    if not self._make_room():
                        raise RuntimeError(
                            "cannot make HBM room for demand fetch: all "
                            "resident blocks pinned — batch exceeds HBM capacity")
                host_slot, hbm_slot = self.directory.start_promote(bid)
                self.transfer.enqueue_promote(bid, host_slot, hbm_slot)
                fetched += 1
        if fetched:
            self.stats.demand_fetch_events += 1
            self.stats.demand_fetch_blocks += fetched
        self._sync_tables(seq_slots)
        return fetched

    def take_migration_plan(self):
        """Pop one migration batch for a fused round dispatch. Excess beyond
        one batch per direction drains via standalone migrate programs first
        (rare). Returns (mig [4, M] int32, up_bids, down_bids); pass the ids
        to `commit_migration` right after dispatching the fused program."""
        assert self._device_mode
        while (self.transfer.pending_up > MIGRATE_BATCH
               or self.transfer.pending_down > MIGRATE_BATCH):
            self.dispatch_migrations(1)
        ups, downs, up_bids, down_bids = self.transfer.take_plan(MIGRATE_BATCH)
        mig = pad_migration(ups, downs, self.guard_slot, self.store.guard_slot)
        return mig, up_bids, down_bids

    def commit_migration(self, up_bids: list[int], down_bids: list[int]) -> None:
        self.transfer.commit(up_bids, down_bids, self.directory)
        self.pool.sync_moved()

    def _ensure_resident_numpy(self, seq_slots: list[int]) -> int:
        fetched = 0
        settle_up = False
        for s in seq_slots:
            # blocks mid-flight downward: cancel writebacks still queued
            # (instant — the HBM copy never moved); only copies already in
            # flight force a wait. Loop: the in-flight cap means one
            # flush+poll pass may not drain every queued writeback.
            while True:
                inflight_down = [
                    b for b in self.pool.seq(s).live_blocks
                    if self.directory.entry(b).state == BlockState.IN_FLIGHT_DOWN
                ]
                if not inflight_down:
                    break
                remaining = [b for b in inflight_down
                             if not self.transfer.cancel_queued_demote(
                                 b, self.directory)]
                if not remaining:
                    break
                self.set_pools(self.transfer.flush(self.pools, self.directory))
                self.transfer.poll(self.directory, wait=True)
            for bid in self.seq_nonresident_blocks(s):
                while self.directory.hbm_free == 0:
                    if not self._make_room():
                        raise RuntimeError(
                            "cannot make HBM room for demand fetch: all "
                            "resident blocks pinned — batch exceeds HBM capacity")
                host_slot, hbm_slot = self.directory.start_promote(bid)
                self.transfer.enqueue_promote(bid, host_slot, hbm_slot)
                fetched += 1
            # prefetched blocks still staging (IN_FLIGHT_UP) must land before
            # this sequence decodes — its table row points at their slots
            settle_up = settle_up or any(
                self.directory.entry(b).state == BlockState.IN_FLIGHT_UP
                for b in self.pool.seq(s).live_blocks)
        if fetched or settle_up:
            if fetched:
                self.stats.demand_fetch_events += 1
                self.stats.demand_fetch_blocks += fetched
            self.set_pools(self.transfer.flush(self.pools, self.directory,
                                               wait_up=True))
            self._sync_tables(seq_slots)
        return fetched

    def _make_room(self) -> bool:
        """Synchronously free at least one HBM slot. False if nothing can be
        reclaimed (everything pinned)."""
        if self._device_mode:
            before = self.directory.hbm_free
            if self.transfer.queued:
                self.dispatch_migrations()
                if self.directory.hbm_free > before:
                    return True
            cands = self._evict_candidates(max(1, self.directory.hbm_pressure()))
            if not cands:
                return False
            self._demote(cands)
            self.dispatch_migrations()
            return self.directory.hbm_free > before
        before = self.directory.hbm_free
        if self.transfer.queued or self.transfer.inflight_down:
            # settle in-flight traffic: completed writebacks free their slots
            # outright; completed promotes turn reserved slots into evictable
            # (unpinned) blocks
            self.set_pools(self.transfer.flush(self.pools, self.directory,
                                               wait_up=True))
            self.transfer.poll(self.directory, wait=True)
            self.pool.sync_moved()
            if self.directory.hbm_free > before:
                return True
        cands = self._evict_candidates(
            max(1, self.directory.hbm_pressure()))
        if not cands:
            return False
        before = self.directory.hbm_free
        self._demote(cands)
        self.set_pools(self.transfer.flush(self.pools, self.directory))
        self.transfer.poll(self.directory, wait=True)
        return self.directory.hbm_free > before

    def prefetch_blocks(self, bids: list[int]) -> int:
        """Asynchronous promote of specific blocks (prefetcher path).

        Prefetch stops at the landing-zone reserve: filling past it would
        make `maintain()` evict right back to the reserve target — and its
        MRU-first order picks the just-prefetched (never-accessed) blocks,
        so the two policies would churn blocks host<->HBM and every such
        round trip counts as a wasted prefetch (measured: 0.57 prefetch
        accuracy in the round-2 bench before this rule). The reserve stays
        whole for decode extends and demand fetches; prefetch depth is
        effectively capacity-bounded."""
        started = 0
        floor = self.directory.config.num_reserved_blocks
        for bid in bids:
            e = self.directory.entry(bid)
            if e.state != BlockState.HOST:
                continue
            if self.directory.hbm_free <= floor:
                break
            host_slot, hbm_slot = self.directory.start_promote(bid, prefetch=True)
            self.transfer.enqueue_promote(bid, host_slot, hbm_slot)
            started += 1
        return started

    def pin_seq(self, seq_slot: int, pinned: bool) -> None:
        for bid in self.pool.seq(seq_slot).live_blocks:
            (self.directory.pin if pinned else self.directory.unpin)(bid)

    # -- background maintenance --------------------------------------------

    def maintain(self) -> None:
        """One tick: demote under pressure, dispatch/flush queued
        migrations, re-sync block-table rows."""
        if self._device_mode:
            # queued demotes free their slots at dispatch: count them as
            # already-reclaiming so deferred flushing doesn't over-demote
            pressure = (self.directory.hbm_pressure()
                        - self.transfer.pending_down)
            if pressure > 0:
                self._evict(pressure)
            self.pool.reap_deferred()
            if not self.defer_migrations and self.transfer.queued:
                # Dispatch policy: promotes flush immediately (prefetch
                # timeliness) and queued writebacks ride the same migrate
                # program for free; writebacks alone accumulate to a full
                # batch — a 16-lane program carrying 4 real lanes costs
                # the same device time as a full one (measured: 11 down
                # dispatches for 46 blocks, ~90ms each). Half-empty
                # reserve forces a flush so stale writebacks can't pin
                # HBM slots indefinitely.
                if (self.transfer.pending_up
                        or self.transfer.pending_down >= MIGRATE_BATCH
                        or self.directory.hbm_free
                        < self.directory.config.num_reserved_blocks // 2):
                    self.dispatch_migrations()
            self.pool.sync_moved()
            return
        self.transfer.poll(self.directory)
        pressure = self.directory.hbm_pressure()
        if pressure > 0:
            self._evict(pressure)
        self.pool.reap_deferred()
        self.set_pools(self.transfer.flush(self.pools, self.directory))
        self.pool.sync_moved()

    def _evict_candidates(self, n: int) -> list[int]:
        """Eviction order for round-robin decode: among unprotected blocks,
        evict MOST-recently-used first — under a cyclic schedule the block
        that just finished its quantum is the one needed furthest in the
        future (plain LRU would evict exactly the next groups up, putting
        their writeback on the schedule's critical path). Protected blocks
        (current + upcoming groups) go only as a last resort."""
        cands = self.directory.evict_candidates(
            n + len(self.protected) + len(self.decode_hot)
            + self.config.num_hbm_blocks // 2)
        hot = self.decode_hot
        cool = [b for b in cands if b not in hot]
        unprot = [b for b in cool if b not in self.protected]
        unprot.sort(key=lambda b: -self.directory.entry(b).last_access)
        ordered = (unprot + [b for b in cool if b in self.protected]
                   + [b for b in cands if b in hot])
        return ordered[:n]

    def _demote(self, bids: list[int]) -> None:
        from cxl_speckv_tpu.core.directory import DirectoryError

        for bid in bids:
            try:
                res = self.directory.start_demote(bid, eviction=True)
            except DirectoryError:
                break  # no host slot free (e.g. HBM-only config): can't demote
            if res is not None:
                hbm_slot, host_slot = res
                self.transfer.enqueue_demote(bid, hbm_slot, host_slot)
            self.stats.maintain_demotes += 1

    def _evict(self, n: int) -> None:
        self._demote(self._evict_candidates(n))

    def _sync_tables(self, seq_slots: list[int]) -> None:
        self.pool.sync_moved()
        for s in seq_slots:
            blocks = self.pool.seq(s).blocks
            for i, bid in enumerate(blocks):
                if bid is None:
                    continue
                e = self.directory.entry(bid)
                if e.hbm_slot >= 0 and self.pool.table.get(s, i) != e.hbm_slot:
                    self.pool.table.set(s, i, e.hbm_slot)

    def sync_all_tables(self) -> None:
        self._sync_tables(self.pool.live_seqs())

    def drain(self) -> None:
        if self._device_mode:
            self.dispatch_migrations()
            return
        self.set_pools(self.transfer.drain(self.pools, self.directory))

    # -- statistics ---------------------------------------------------------

    def get_statistics(self) -> dict:
        return {
            "directory": self.directory.get_statistics().as_dict(),
            "transfer": self.transfer.get_statistics().as_dict(),
            "pool": self.pool.get_statistics().as_dict(),
            "runtime": self.stats.as_dict(),
            "compression": self.compression_statistics(),
            "hbm_free": self.directory.hbm_free,
            "host_free": self.directory.host_free,
        }

    def compression_statistics(self) -> dict:
        """The compression/capacity surface (analog of the FPGA engine stats,
        `cache_engine.h:65-72`, and the capacity-expansion claims,
        `README.md:16-18`): storage ratio vs bf16 KV and the effective
        token capacity expansion vs an uncompressed HBM-only cache."""
        from cxl_speckv_tpu.ops.quant import compressed_bytes_per_token

        c = self.model_config
        cc = self.config
        bytes_tok = compressed_bytes_per_token(c.num_kv_heads, c.head_dim,
                                               self.kv_dtype) * c.num_layers
        bf16_tok = compressed_bytes_per_token(c.num_kv_heads, c.head_dim,
                                              KVDtype.BF16) * c.num_layers
        pooling = (cc.num_hbm_blocks + cc.num_host_blocks) / cc.num_hbm_blocks
        ratio = bf16_tok / bytes_tok
        return {
            "kv_dtype": self.kv_dtype.value,
            "bytes_per_token_per_layer": bytes_tok // c.num_layers,
            "storage_ratio_vs_bf16": round(ratio, 3),
            "capacity_expansion_pooling": round(pooling, 2),
            "effective_capacity_expansion": round(pooling * ratio, 2),
            "hbm_token_capacity": cc.num_hbm_blocks * cc.block_size,
            "total_token_capacity": cc.total_blocks * cc.block_size,
        }

    def reset_statistics(self) -> None:
        self.directory.reset_statistics()
        self.transfer.reset_statistics()
        self.pool.reset_statistics()
        self.stats.reset()
