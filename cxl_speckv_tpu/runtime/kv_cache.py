"""TieredKVCache — the top-level memory system facade.

Analog of the reference `CXLSpecKVSystem` + `CXLMemoryAllocator` wiring
(`src/cxl_speckv_system.cpp:21-37`, `src/integration/memory_allocator.cpp:
16-43`): owns the device pools, the host store, the residency directory, the
per-sequence block pool, and the transfer engine, and exposes the operations
the serving engine needs:

- `extend_seq` / `free_seq`: capacity allocation with OOM backpressure
- `ensure_resident`: demand-fetch for scheduled sequences (the synchronous
  `sync_fetch_page` slow path, `host/src/speckv_allocator.cpp:115-138` —
  counted as stall so the prefetcher's value is measurable)
- `prefetch_blocks`: asynchronous promote (the prefetch DMA path)
- `maintain`: eviction to keep the prefetch landing zone free + transfer
  retirement (the background tier management)

Device pool layout (per layer, all layers stacked):
    k_pools/v_pools [L, hbm_slots+1, Hkv, block_size, D/pack]
      (one extra guard slot so padded scatters can target it with mode=drop)
    k_scales/v_scales [L, hbm_slots+1, Hkv, block_size]
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
from cxl_speckv_tpu.runtime.transfer import HostStore, TransferEngine


@dataclass
class CacheRuntimeStatistics(Statistics):
    demand_fetch_events: int = 0     # scheduler had to stall for a block
    demand_fetch_blocks: int = 0
    maintain_demotes: int = 0


class TieredKVCache:
    def __init__(self, cache_config: CacheConfig, model_config: LlamaConfig,
                 max_seqs: int, max_blocks_per_seq: int, device_put=None,
                 native: bool | None = None):
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
            from cxl_speckv_tpu.native import NativeResidencyDirectory
            self.directory = NativeResidencyDirectory(cache_config)
        else:
            self.directory = ResidencyDirectory(cache_config)
        self.pool = BlockPool(cache_config, self.directory, max_seqs, max_blocks_per_seq)

        c = model_config
        pack = 2 if self.kv_dtype == KVDtype.INT4 else 1
        dp = c.head_dim // pack
        elem = kv_storage_dtype(self.kv_dtype)
        S = cache_config.num_hbm_blocks + 1  # +1 guard slot for dropped scatters
        put = device_put or jax.device_put
        kv_shape = (c.num_layers, S, c.num_kv_heads, cache_config.block_size, dp)
        sc_shape = (c.num_layers, S, c.num_kv_heads, cache_config.block_size)
        self.k_pools = put(jnp.zeros(kv_shape, elem))
        self.v_pools = put(jnp.zeros(kv_shape, elem))
        self.k_scales = put(jnp.ones(sc_shape, jnp.float32))
        self.v_scales = put(jnp.ones(sc_shape, jnp.float32))

        self.host = HostStore(
            cache_config.num_host_blocks, c.num_layers, cache_config.block_size,
            c.num_kv_heads, dp, np.dtype(elem))
        self.transfer = TransferEngine(self.host)
        # blocks the scheduler expects to need soon (current + upcoming decode
        # groups): eviction takes them only as a last resort, so proactive
        # writebacks don't fight the prefetcher over the same blocks
        self.protected: set[int] = set()
        self.stats = CacheRuntimeStatistics()

    # -- pools plumbing (donation-safe single ownership) --------------------

    @property
    def pools(self):
        return (self.k_pools, self.v_pools, self.k_scales, self.v_scales)

    def set_pools(self, pools) -> None:
        self.k_pools, self.v_pools, self.k_scales, self.v_scales = pools

    @property
    def guard_slot(self) -> int:
        return self.config.num_hbm_blocks

    # -- sequence capacity --------------------------------------------------

    def add_seq(self) -> int | None:
        return self.pool.add_seq()

    def extend_seq(self, seq_slot: int, new_total_tokens: int) -> bool:
        """Grow; on HBM pressure, evict cold blocks first. False = true OOM."""
        need = self.pool.blocks_needed(seq_slot, new_total_tokens)
        if need > self.directory.hbm_free:
            self._evict(need - self.directory.hbm_free)
            # only free-demotions take effect synchronously; dirty writebacks
            # must be flushed and completed before their slots free up
            if need > self.directory.hbm_free:
                self.set_pools(self.transfer.flush(self.pools, self.directory))
                self.transfer.poll(self.directory, wait=True)
        return self.pool.extend(seq_slot, new_total_tokens)

    def free_seq(self, seq_slot: int) -> None:
        self.pool.free_seq(seq_slot)

    # -- residency management ----------------------------------------------

    def seq_nonresident_blocks(self, seq_slot: int) -> list[int]:
        return [
            bid for bid in self.pool.seq(seq_slot).blocks
            if self.directory.entry(bid).state == BlockState.HOST
        ]

    def touch_seq(self, seq_slot: int) -> None:
        """Record accesses for every block of a scheduled sequence (hit-rate
        accounting — each decode step reads all blocks of the sequence)."""
        for bid in self.pool.seq(seq_slot).blocks:
            self.directory.access(bid)

    def ensure_resident(self, seq_slots: list[int]) -> int:
        """Demand-fetch every non-resident block of the given sequences,
        synchronously (the stall path). Returns blocks fetched."""
        fetched = 0
        settle_up = False
        for s in seq_slots:
            # blocks mid-flight downward: cancel writebacks still queued
            # (instant — the HBM copy never moved); only copies already in
            # flight force a wait. Loop: the in-flight cap means one
            # flush+poll pass may not drain every queued writeback.
            while True:
                inflight_down = [
                    b for b in self.pool.seq(s).blocks
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
                for b in self.pool.seq(s).blocks)
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
        from cxl_speckv_tpu.core.directory import DirectoryError

        before = self.directory.hbm_free
        for bid in cands:
            try:
                res = self.directory.start_demote(bid, eviction=True)
            except DirectoryError:
                break  # host tier full/absent — nothing to demote into
            if res is not None:
                self.transfer.enqueue_demote(bid, *res)
            self.stats.maintain_demotes += 1
        self.set_pools(self.transfer.flush(self.pools, self.directory))
        self.transfer.poll(self.directory, wait=True)
        return self.directory.hbm_free > before

    def prefetch_blocks(self, bids: list[int]) -> int:
        """Asynchronous promote of specific blocks (prefetcher path)."""
        started = 0
        # the landing-zone reserve exists FOR prefetch (the L2-buffer
        # analog); keep only a small constant headroom for demand fetches
        headroom = 2
        for bid in bids:
            e = self.directory.entry(bid)
            if e.state != BlockState.HOST:
                continue
            if self.directory.hbm_free <= headroom:
                break
            host_slot, hbm_slot = self.directory.start_promote(bid, prefetch=True)
            self.transfer.enqueue_promote(bid, host_slot, hbm_slot)
            started += 1
        return started

    def pin_seq(self, seq_slot: int, pinned: bool) -> None:
        for bid in self.pool.seq(seq_slot).blocks:
            (self.directory.pin if pinned else self.directory.unpin)(bid)

    # -- background maintenance --------------------------------------------

    def maintain(self) -> None:
        """One tick: retire finished transfers, demote under pressure,
        flush queued migrations, re-sync block-table rows."""
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
            n + len(self.protected) + self.config.num_hbm_blocks // 2)
        unprot = [b for b in cands if b not in self.protected]
        unprot.sort(key=lambda b: -self.directory.entry(b).last_access)
        ordered = unprot + [b for b in cands if b in self.protected]
        return ordered[:n]

    def _evict(self, n: int) -> None:
        from cxl_speckv_tpu.core.directory import DirectoryError

        for bid in self._evict_candidates(n):
            try:
                res = self.directory.start_demote(bid, eviction=True)
            except DirectoryError:
                break  # no host slot free (e.g. HBM-only config): can't demote
            if res is not None:
                hbm_slot, host_slot = res
                self.transfer.enqueue_demote(bid, hbm_slot, host_slot)
            self.stats.maintain_demotes += 1

    def _sync_tables(self, seq_slots: list[int]) -> None:
        self.pool.sync_moved()
        for s in seq_slots:
            blocks = self.pool.seq(s).blocks
            for i, bid in enumerate(blocks):
                e = self.directory.entry(bid)
                if e.hbm_slot >= 0 and self.pool.table.get(s, i) != e.hbm_slot:
                    self.pool.table.set(s, i, e.hbm_slot)

    def sync_all_tables(self) -> None:
        self._sync_tables(self.pool.live_seqs())

    def drain(self) -> None:
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
