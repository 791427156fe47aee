"""Asynchronous host <-> HBM block transfer engine.

TPU-native replacement for the reference DMA stack: the scatter-gather DMA
engine (`hardware/rtl/dma_engine.v:5-219`, descriptor FIFO + completion
counting), the kernel MMIO ring (`driver/speckv_kernel_module.c:58-113`), and
the user-space batch-submit/poll path (`host/src/speckv_driver.cpp:24-72`).

Mapping (SURVEY.md section 7.0):
- DMA descriptor {fpga_addr, gpu_addr, bytes, flags} -> a (bid, host_slot,
  hbm_slot, direction) transfer record.
- The MMIO descriptor ring -> per-step batched jitted scatter/gather: all
  queued up-migrations land in ONE donated `.at[:, slots].set()` per flush
  (in-place on TPU), all down-migrations leave in ONE gather +
  `copy_to_host_async`.
- `poll_complete` -> `poll()`, which checks `jax.Array.is_ready()` on
  outstanding device->host copies and retires them into the host store.

Ordering/correctness: up-transfers are complete from the device program's
perspective the moment the scatter is dispatched — XLA dispatch order means
any later decode step that reads the pool array sees the inserted blocks
(dataflow, not races). The IN_FLIGHT_UP state therefore collapses at flush
time. Down-transfers genuinely complete asynchronously (device->host DMA
overlaps decode compute) and are retired by `poll()`.

Transfer batch sizes are bucketed to powers of two so jit caches a handful of
scatter/gather programs; padding lanes use an out-of-range slot with
scatter-mode "drop" so they write nowhere.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from cxl_speckv_tpu.core.stats import Statistics, ratio

Pools = tuple[jax.Array, jax.Array, jax.Array, jax.Array]  # k, v, k_scale, v_scale


@dataclass
class TransferStatistics(Statistics):
    """Analog of driver op counts (`speckv_driver.h:72-77`) + engine stats."""

    up_transfers: int = 0          # blocks migrated host -> HBM
    down_transfers: int = 0        # blocks migrated HBM -> host
    up_batches: int = 0
    down_batches: int = 0
    bytes_up: int = 0
    bytes_down: int = 0
    polls: int = 0
    up_wait_ms: float = 0.0        # host-side staging time
    down_wait_ms: float = 0.0      # time spent blocking on D2H completion


class HostStore:
    """Host-DRAM block pool — the CXL-pool analog (`cxl_mem_if.v`, L3 tier).

    Layout: one block spans ALL layers (migration granularity, SURVEY.md
    section 7.0): k/v [host_slots, L, Hkv, bs, D/pack], scales
    [host_slots, L, Hkv, bs].
    """

    def __init__(self, host_slots: int, num_layers: int, block_size: int,
                 num_kv_heads: int, head_dim_packed: int, kv_elem_dtype):
        shape = (host_slots, num_layers, num_kv_heads, block_size, head_dim_packed)
        self.k = np.zeros(shape, dtype=kv_elem_dtype)
        self.v = np.zeros(shape, dtype=kv_elem_dtype)
        sshape = (host_slots, num_layers, num_kv_heads, block_size)
        self.ks = np.ones(sshape, dtype=np.float32)
        self.vs = np.ones(sshape, dtype=np.float32)

    @property
    def bytes_per_block(self) -> int:
        per_slot = (self.k[0].nbytes + self.v[0].nbytes
                    + self.ks[0].nbytes + self.vs[0].nbytes)
        return per_slot


_TRANSFER_BATCH = 16  # fixed migration batch (descriptor-ring depth analog)


def _bucket(n: int) -> int:
    """Fixed-size batches: one scatter/gather program compiles per pool
    geometry instead of one per power-of-two size — first-execution compile
    cost on remote TPU backends is tens of seconds per distinct program."""
    return _TRANSFER_BATCH * (-(-n // _TRANSFER_BATCH))


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_in(pools: Pools, kd, vd, ksd, vsd, slots) -> Pools:
    """Insert staged blocks. kd/vd: [N, L, Hkv, bs, Dp] staged token-major;
    K transposes into the kT pool layout on the way (ops/paged_attention)."""
    from cxl_speckv_tpu.ops.paged_attention import store_to_kt

    k, v, ks, vs = pools
    k = k.at[:, slots].set(store_to_kt(kd).swapaxes(0, 1), mode="drop")
    v = v.at[:, slots].set(vd.swapaxes(0, 1), mode="drop")
    flat = lambda s: s.reshape(*s.shape[:2], 1, -1)  # staged [N,L,Hkv,bs]
    ks = ks.at[:, slots].set(flat(ksd).swapaxes(0, 1), mode="drop")
    vs = vs.at[:, slots].set(flat(vsd).swapaxes(0, 1), mode="drop")
    return k, v, ks, vs


@jax.jit
def _gather_out(pools: Pools, slots):
    from cxl_speckv_tpu.ops.paged_attention import kt_to_store

    k, v, ks, vs = pools
    hkv, bs = v.shape[2], v.shape[3]
    unflat = lambda s: s.reshape(*s.shape[:2], hkv, bs)
    return (kt_to_store(k[:, slots].swapaxes(0, 1), hkv),
            v[:, slots].swapaxes(0, 1),
            unflat(ks[:, slots].swapaxes(0, 1)),
            unflat(vs[:, slots].swapaxes(0, 1)))


@dataclass
class _PendingDown:
    bids: list[int]
    host_slots: list[int]
    arrays: tuple  # device arrays with copy_to_host_async issued
    started: float = field(default_factory=time.monotonic)


@dataclass
class _PendingUp:
    ups: list[tuple[int, int, int]]
    future: object  # Future -> (kd, vd, ksd, vsd, slots) device arrays


class MigrationPlanner:
    """Migration queue for the device-side host store (`runtime/hoststore.py`).

    Replaces TransferEngine's staging/poll machinery when the host tier
    lives in pinned-host device memory: block data never crosses the host
    process, so a migration is just a (bid, src_slot, dst_slot) record that
    rides the next `migrate_program` (or fused engine-round) dispatch and
    *completes at dispatch* — XLA dataflow ordering through the chained
    pools/store arrays is the completion guarantee (see hoststore.py).

    The descriptor-ring analog survives as the fixed migration batch width;
    `take_plan` pops up to one batch per direction, the caller dispatches,
    then `commit` finalizes directory state.
    """

    def __init__(self, bytes_per_block: int):
        self._up: list[tuple[int, int, int]] = []    # (bid, host_slot, hbm_slot)
        self._down: list[tuple[int, int, int]] = []  # (bid, hbm_slot, host_slot)
        self._bytes_per_block = bytes_per_block
        self.stats = TransferStatistics()

    def enqueue_promote(self, bid: int, host_slot: int, hbm_slot: int) -> None:
        self._up.append((bid, host_slot, hbm_slot))

    def enqueue_demote(self, bid: int, hbm_slot: int, host_slot: int) -> None:
        self._down.append((bid, hbm_slot, host_slot))

    def cancel_queued_demote(self, bid: int, directory) -> bool:
        """Demotes only move at dispatch, so an undispatched writeback always
        cancels instantly (the block's HBM copy never moved)."""
        for i, (b, _, _) in enumerate(self._down):
            if b == bid:
                del self._down[i]
                directory.cancel_demote(bid)
                return True
        return False

    @property
    def queued(self) -> int:
        return len(self._up) + len(self._down)

    @property
    def pending_up(self) -> int:
        return len(self._up)

    @property
    def pending_down(self) -> int:
        return len(self._down)

    def take_plan(self, batch: int):
        """Pop up to `batch` ops per direction: (ups, downs) slot-pair lists
        + bid lists for commit."""
        ups, self._up = self._up[:batch], self._up[batch:]
        downs, self._down = self._down[:batch], self._down[batch:]
        return ([(h, d) for _, h, d in ups],
                [(d, h) for _, d, h in downs],
                [b for b, _, _ in ups],
                [b for b, _, _ in downs])

    def commit(self, up_bids: list[int], down_bids: list[int], directory) -> None:
        """Mark a dispatched plan complete (the dispatch IS the completion)."""
        for bid in up_bids:
            directory.complete_promote(bid)
        for bid in down_bids:
            directory.complete_demote(bid)
        if up_bids:
            self.stats.up_transfers += len(up_bids)
            self.stats.up_batches += 1
            self.stats.bytes_up += len(up_bids) * self._bytes_per_block
        if down_bids:
            self.stats.down_transfers += len(down_bids)
            self.stats.down_batches += 1
            self.stats.bytes_down += len(down_bids) * self._bytes_per_block

    def get_statistics(self) -> TransferStatistics:
        return self.stats

    def reset_statistics(self) -> None:
        self.stats.reset()


class TransferEngine:
    """Batches block migrations between the HBM pools and the host store.

    Promotes are two-phase so the slow host->device copy overlaps decode:
    a background stager thread slices the host store and issues the H2D
    transfer (phase a); the next `flush()` applies already-staged batches to
    the pools with one fast device scatter (phase b) and only then marks the
    blocks HBM-resident. Without the thread, staging would serialize on the
    engine's decode-sync point and the prefetcher could never hide latency.
    """

    def __init__(self, host_store: HostStore, max_inflight_down: int = 16):
        from concurrent.futures import ThreadPoolExecutor

        self.host = host_store
        self.max_inflight_down = max_inflight_down
        self._up_queue: list[tuple[int, int, int]] = []    # (bid, host_slot, hbm_slot)
        self._down_queue: list[tuple[int, int, int]] = []  # (bid, hbm_slot, host_slot)
        self._pending_down: list[_PendingDown] = []
        self._pending_up: list[_PendingUp] = []
        self._stager = ThreadPoolExecutor(max_workers=1,
                                          thread_name_prefix="speckv-stager")
        self.stats = TransferStatistics()

    def _stage_up(self, ups, num_pool_slots):
        """Worker: host store -> device staging arrays (the tunnel-bound H2D)."""
        nb = _TRANSFER_BATCH
        n = len(ups)
        hs = [u[1] for u in ups]
        kd = np.zeros((nb, *self.host.k.shape[1:]), self.host.k.dtype)
        vd = np.zeros_like(kd)
        ksd = np.ones((nb, *self.host.ks.shape[1:]), np.float32)
        vsd = np.ones_like(ksd)
        kd[:n], vd[:n] = self.host.k[hs], self.host.v[hs]
        ksd[:n], vsd[:n] = self.host.ks[hs], self.host.vs[hs]
        slots = np.full(nb, num_pool_slots, np.int32)  # pad -> dropped
        slots[:n] = [u[2] for u in ups]
        arrs = (jnp.asarray(kd), jnp.asarray(vd), jnp.asarray(ksd),
                jnp.asarray(vsd), jnp.asarray(slots))
        for a in arrs[:4]:
            a.block_until_ready()
        return arrs

    # -- enqueue (the descriptor ring analog) -------------------------------

    def enqueue_promote(self, bid: int, host_slot: int, hbm_slot: int) -> None:
        self._up_queue.append((bid, host_slot, hbm_slot))

    def enqueue_demote(self, bid: int, hbm_slot: int, host_slot: int) -> None:
        self._down_queue.append((bid, hbm_slot, host_slot))

    def cancel_queued_demote(self, bid: int, directory) -> bool:
        """Cancel a writeback that has not been gathered yet: the block's HBM
        copy was readable all along, so it just stays resident. Returns False
        when the copy is already in flight (caller must wait it out)."""
        for i, (b, _, _) in enumerate(self._down_queue):
            if b == bid:
                del self._down_queue[i]
                directory.cancel_demote(bid)
                return True
        return False

    @property
    def inflight_down(self) -> int:
        return sum(len(p.bids) for p in self._pending_down)

    @property
    def inflight_up(self) -> int:
        return sum(len(p.ups) for p in self._pending_up)

    @property
    def queued(self) -> int:
        return len(self._up_queue) + len(self._down_queue) + self.inflight_up

    # -- flush: one batched scatter + one batched gather per step -----------

    def flush(self, pools: Pools, directory, *, wait_up: bool = False) -> Pools:
        """Apply migrations. Returns the updated pools tuple.

        Queued promotes are handed to the stager thread (phase a); staged
        batches whose H2D finished are scattered into the pools (phase b) and
        their blocks complete. With wait_up=True (demand-fetch path) all
        in-flight promotes are forced to completion before returning.
        Demotes become pending until `poll()` sees the D2H copy finish.
        """
        nb = _TRANSFER_BATCH
        num_pool_slots = int(pools[0].shape[1])
        while self._up_queue:
            ups = self._up_queue[:nb]
            del self._up_queue[:nb]
            self._pending_up.append(_PendingUp(
                ups=ups,
                future=self._stager.submit(self._stage_up, ups, num_pool_slots)))

        still = []
        for p in self._pending_up:
            if not (wait_up or p.future.done()):
                still.append(p)
                continue
            t0 = time.monotonic()
            kd, vd, ksd, vsd, slots = p.future.result()  # blocks if wait_up
            self.stats.up_wait_ms += (time.monotonic() - t0) * 1e3
            pools = _scatter_in(pools, kd, vd, ksd, vsd, slots)
            for bid, _, _ in p.ups:
                directory.complete_promote(bid)
            self.stats.up_transfers += len(p.ups)
            self.stats.up_batches += 1
            self.stats.bytes_up += len(p.ups) * self.host.bytes_per_block
        self._pending_up = still

        while self._down_queue and self.inflight_down < self.max_inflight_down:
            downs = self._down_queue[:nb]
            del self._down_queue[:nb]
            n = len(downs)
            slots = np.zeros(nb, np.int32)  # pad gathers slot 0, sliced off in poll
            slots[:n] = [d[1] for d in downs]
            arrs = _gather_out(pools, jnp.asarray(slots))
            for a in arrs:
                a.copy_to_host_async()
            self._pending_down.append(_PendingDown(
                bids=[d[0] for d in downs],
                host_slots=[d[2] for d in downs],
                arrays=arrs,
            ))
            self.stats.down_batches += 1
        return pools

    # -- poll: the SPECKV_IOCTL_POLL_DONE analog ----------------------------

    def poll(self, directory, *, wait: bool = False) -> int:
        """Retire completed down-transfers into the host store. Returns the
        number of blocks retired. With wait=True, blocks until all pending
        down-transfers finish (the flush_all analog)."""
        self.stats.polls += 1
        done = 0
        still = []
        for p in self._pending_down:
            ready = all(a.is_ready() for a in p.arrays)
            if not ready and not wait:
                still.append(p)
                continue
            t0 = time.monotonic()
            k, v, ks, vs = (np.asarray(a) for a in p.arrays)  # blocks if !ready
            self.stats.down_wait_ms += (time.monotonic() - t0) * 1e3
            hs = p.host_slots
            n = len(hs)
            self.host.k[hs], self.host.v[hs] = k[:n], v[:n]
            self.host.ks[hs], self.host.vs[hs] = ks[:n], vs[:n]
            for bid in p.bids:
                directory.complete_demote(bid)
            done += len(p.bids)
            self.stats.down_transfers += len(p.bids)
            self.stats.bytes_down += len(p.bids) * self.host.bytes_per_block
        self._pending_down = still
        return done

    def drain(self, pools: Pools, directory) -> Pools:
        """Flush everything and wait (destructor-flush analog,
        `coherence_manager.cpp:28-31`)."""
        while self._up_queue or self._down_queue or self._pending_up:
            pools = self.flush(pools, directory, wait_up=True)
            self.poll(directory, wait=True)
        self.poll(directory, wait=True)
        return pools

    def get_statistics(self) -> TransferStatistics:
        return self.stats

    def reset_statistics(self) -> None:
        self.stats.reset()
