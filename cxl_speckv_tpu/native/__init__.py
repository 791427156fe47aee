"""ctypes bindings for the native (C++) residency directory.

The TPU-native analog of the reference Python ctypes layer
(`host/python/speckv_ctypes.py:7-62` loading `libcxlspeckv.so`): loads
`native/libspeckv_runtime.so`, auto-building it with make/g++ on first use,
and exposes `NativeResidencyDirectory` with the exact interface of the pure-
Python `cxl_speckv_tpu.core.directory.ResidencyDirectory` — the state-machine
test suite runs against both implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

from cxl_speckv_tpu.config import CacheConfig
from cxl_speckv_tpu.core.directory import (
    BlockState,
    DirectoryError,
    DirectoryStatistics,
)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libspeckv_runtime.so"
_lib = None

_STATS_FIELDS = (
    "accesses", "hbm_hits", "demand_misses", "inflight_hits", "allocations",
    "frees", "promotions", "demotions", "clean_drops", "evictions",
    "prefetch_fills", "prefetch_hits", "prefetch_wasted", "oom_events",
)

_ERRORS = {
    -1: "unknown block",
    -2: "illegal state transition",
    -3: "block is pinned",
    -4: "no free slot",
    -5: "block mid-transfer",
}


class _EntryInfo(ctypes.Structure):
    _fields_ = [
        ("state", ctypes.c_int32),
        ("hbm_slot", ctypes.c_int32),
        ("host_slot", ctypes.c_int32),
        ("dirty", ctypes.c_int32),
        ("pinned", ctypes.c_int32),
        ("prefetched", ctypes.c_int32),
        ("access_count", ctypes.c_int64),
        ("last_access", ctypes.c_int64),
    ]


def build_native(force: bool = False) -> Path:
    """Build libspeckv_runtime.so with make (g++ is baked into the image).

    Always invokes make — the Makefile is incremental (keyed on the
    .cpp/.hpp sources), so an up-to-date .so costs one no-op make while a
    stale one is rebuilt instead of silently loaded."""
    cmd = ["make", "-C", str(_NATIVE_DIR)]
    if force:
        cmd.append("-B")
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    build_native()
    lib = ctypes.CDLL(str(_SO))
    u64, i64, i32 = ctypes.c_uint64, ctypes.c_int64, ctypes.c_int32
    p32, p64 = ctypes.POINTER(i32), ctypes.POINTER(i64)
    sigs = {
        "speckv_pool_create": ([u64, i32, i32, i32], u64),
        "speckv_pool_destroy": ([u64], None),
        "speckv_pool_add_seq": ([u64], i32),
        "speckv_pool_free_seq": ([u64, i32], i32),
        "speckv_pool_blocks_needed": ([u64, i32, i64], i32),
        "speckv_pool_extend": ([u64, i32, i64], i32),
        "speckv_pool_retire_below": ([u64, i32, i32, p64, p64, i32], i32),
        "speckv_pool_reap_deferred": ([u64], None),
        "speckv_pool_refresh_slot": ([u64, i32, i32], i32),
        "speckv_pool_locate": ([u64, i64, p32], i64),
        "speckv_pool_sync_moved": ([u64], i32),
        "speckv_pool_live_seqs": ([u64, p32, i32], i32),
        "speckv_pool_seq_tokens": ([u64, i32], i64),
        "speckv_pool_seq_blocks": ([u64, i32, p64, i32], i32),
        "speckv_pool_last_block": ([u64, i32], i64),
        "speckv_pool_has_seq": ([u64, i32], i32),
        "speckv_pool_is_live": ([u64, i64], i32),
        "speckv_pool_share_block": ([u64, i32, i64], i32),
        "speckv_pool_table": ([u64], ctypes.POINTER(i32)),
        "speckv_pool_stats": ([u64, p64], i32),
        "speckv_pool_reset_stats": ([u64], None),
        "speckv_dir_create": ([i32, i32, i32, i32], u64),
        "speckv_dir_destroy": ([u64], None),
        "speckv_dir_allocate": ([u64, i32], i64),
        "speckv_dir_allocate_host": ([u64], i64),
        "speckv_dir_free_block": ([u64, i64], i32),
        "speckv_dir_access": ([u64, i64], i32),
        "speckv_dir_mark_dirty": ([u64, i64], i32),
        "speckv_dir_pin": ([u64, i64, i32], i32),
        "speckv_dir_start_promote": ([u64, i64, i32, p32, p32], i32),
        "speckv_dir_complete_promote": ([u64, i64], i32),
        "speckv_dir_start_demote": ([u64, i64, i32, p32, p32], i32),
        "speckv_dir_complete_demote": ([u64, i64], i32),
        "speckv_dir_cancel_demote": ([u64, i64], i32),
        "speckv_dir_evict_candidates": ([u64, i32, p64], i32),
        "speckv_dir_hbm_free": ([u64], i32),
        "speckv_dir_host_free": ([u64], i32),
        "speckv_dir_pressure": ([u64], i32),
        "speckv_dir_size": ([u64], i64),
        "speckv_dir_entry": ([u64, i64, ctypes.POINTER(_EntryInfo)], i32),
        "speckv_dir_stats": ([u64, p64], i32),
        "speckv_dir_reset_stats": ([u64], None),
        "speckv_dir_take_moved": ([u64, p64, i32], i32),
        "speckv_dir_state_counts": ([u64, p64], i32),
    }
    for name, (argtypes, restype) in sigs.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = restype
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


class _EntryView:
    """Read/write view over one native entry, mimicking DirectoryEntry."""

    __slots__ = ("_dir", "bid")

    def __init__(self, d: "NativeResidencyDirectory", bid: int):
        self._dir = d
        self.bid = bid

    def _info(self) -> _EntryInfo:
        info = _EntryInfo()
        rc = self._dir._lib.speckv_dir_entry(self._dir._h, self.bid,
                                             ctypes.byref(info))
        if rc < 0:
            raise DirectoryError(f"unknown block {self.bid}")
        return info

    @property
    def state(self) -> BlockState:
        return BlockState(self._info().state)

    @property
    def hbm_slot(self) -> int:
        return self._info().hbm_slot

    @property
    def host_slot(self) -> int:
        return self._info().host_slot

    @property
    def dirty(self) -> bool:
        return bool(self._info().dirty)

    @dirty.setter
    def dirty(self, value: bool) -> None:
        if value:
            self._dir.mark_dirty(self.bid)
        else:
            raise NotImplementedError("clearing dirty is transfer-driven")

    @property
    def pinned(self) -> bool:
        return bool(self._info().pinned)

    @property
    def prefetched(self) -> bool:
        return bool(self._info().prefetched)

    @property
    def access_count(self) -> int:
        return self._info().access_count

    @property
    def last_access(self) -> int:
        return self._info().last_access


class NativeResidencyDirectory:
    """Drop-in replacement for `core.directory.ResidencyDirectory`."""

    def __init__(self, config: CacheConfig):
        config.validate()
        self.config = config
        self._lib = load_library()
        self._h = self._lib.speckv_dir_create(
            config.num_hbm_blocks, config.num_host_blocks,
            config.num_reserved_blocks, config.hot_access_threshold)

    def __del__(self):
        try:
            self._lib.speckv_dir_destroy(self._h)
        except Exception:
            pass

    def _check(self, rc: int, op: str, bid=None) -> int:
        if rc < 0:
            raise DirectoryError(f"{op}({bid}): {_ERRORS.get(rc, rc)}")
        return rc

    # -- interface parity with the Python directory -------------------------

    def entry(self, bid: int) -> _EntryView:
        v = _EntryView(self, bid)
        v._info()  # raises on unknown block
        return v

    def __contains__(self, bid: int) -> bool:
        info = _EntryInfo()
        return self._lib.speckv_dir_entry(self._h, bid, ctypes.byref(info)) == 0

    def __len__(self) -> int:
        return self._lib.speckv_dir_size(self._h)

    @property
    def hbm_free(self) -> int:
        return self._lib.speckv_dir_hbm_free(self._h)

    @property
    def host_free(self) -> int:
        return self._lib.speckv_dir_host_free(self._h)

    def allocate(self, *, pinned: bool = True) -> int | None:
        bid = self._lib.speckv_dir_allocate(self._h, int(pinned))
        return None if bid < 0 else bid

    def allocate_host(self) -> int | None:
        bid = self._lib.speckv_dir_allocate_host(self._h)
        return None if bid < 0 else bid

    def free(self, bid: int) -> None:
        self._check(self._lib.speckv_dir_free_block(self._h, bid), "free", bid)

    def access(self, bid: int) -> BlockState:
        return BlockState(self._check(
            self._lib.speckv_dir_access(self._h, bid), "access", bid))

    def mark_dirty(self, bid: int) -> None:
        self._check(self._lib.speckv_dir_mark_dirty(self._h, bid), "mark_dirty", bid)

    def pin(self, bid: int) -> None:
        self._check(self._lib.speckv_dir_pin(self._h, bid, 1), "pin", bid)

    def unpin(self, bid: int) -> None:
        self._check(self._lib.speckv_dir_pin(self._h, bid, 0), "unpin", bid)

    def start_promote(self, bid: int, *, prefetch: bool = False) -> tuple[int, int]:
        hs, ds = ctypes.c_int32(), ctypes.c_int32()
        self._check(self._lib.speckv_dir_start_promote(
            self._h, bid, int(prefetch), ctypes.byref(hs), ctypes.byref(ds)),
            "start_promote", bid)
        return hs.value, ds.value

    def complete_promote(self, bid: int) -> None:
        self._check(self._lib.speckv_dir_complete_promote(self._h, bid),
                    "complete_promote", bid)

    def start_demote(self, bid: int, *, eviction: bool = False) -> tuple[int, int] | None:
        ds, hs = ctypes.c_int32(), ctypes.c_int32()
        rc = self._check(self._lib.speckv_dir_start_demote(
            self._h, bid, int(eviction), ctypes.byref(ds), ctypes.byref(hs)),
            "start_demote", bid)
        return None if rc == 0 else (ds.value, hs.value)

    def complete_demote(self, bid: int) -> None:
        self._check(self._lib.speckv_dir_complete_demote(self._h, bid),
                    "complete_demote", bid)

    def cancel_demote(self, bid: int) -> None:
        self._check(self._lib.speckv_dir_cancel_demote(self._h, bid),
                    "cancel_demote", bid)

    def evict_candidates(self, n: int) -> list[int]:
        out = (ctypes.c_int64 * max(n, 1))()
        m = self._check(self._lib.speckv_dir_evict_candidates(self._h, n, out),
                        "evict_candidates")
        return [out[i] for i in range(m)]

    def hbm_pressure(self) -> int:
        return self._lib.speckv_dir_pressure(self._h)

    def state_counts(self) -> dict[str, int]:
        out = (ctypes.c_int64 * 5)()
        self._check(self._lib.speckv_dir_state_counts(self._h, out), "state_counts")
        return {s.name: out[s.value] for s in BlockState}

    def take_moved(self) -> set[int]:
        out = (ctypes.c_int64 * 4096)()
        moved: set[int] = set()
        while True:
            m = self._lib.speckv_dir_take_moved(self._h, out, 4096)
            moved.update(out[i] for i in range(m))
            if m < 4096:
                return moved

    def get_statistics(self) -> DirectoryStatistics:
        out = (ctypes.c_int64 * 14)()
        self._check(self._lib.speckv_dir_stats(self._h, out), "stats")
        return DirectoryStatistics(**dict(zip(_STATS_FIELDS, out)))

    # Property parity: Python code reads `.stats` counters directly.
    @property
    def stats(self) -> DirectoryStatistics:
        return self.get_statistics()

    def reset_statistics(self) -> None:
        self._lib.speckv_dir_reset_stats(self._h)


# ---------------------------------------------------------------------------
# Native BlockPool — C++ per-sequence allocator (reference SpeckvAllocator
# analog, host/src/speckv_allocator.cpp), drop-in for core.block_pool.BlockPool
# ---------------------------------------------------------------------------

import numpy as np

from cxl_speckv_tpu.core.block_pool import PoolStatistics
from cxl_speckv_tpu.core.block_table import BlockTable

_POOL_STATS_FIELDS = (
    "seqs_allocated", "seqs_freed", "blocks_allocated", "blocks_freed",
    "peak_blocks", "alloc_failures", "blocks_shared",
)


class _NativeSeqView:
    """SeqAlloc-compatible view over one native sequence."""

    __slots__ = ("_pool", "seq_slot")

    def __init__(self, pool: "NativeBlockPool", seq_slot: int):
        self._pool = pool
        self.seq_slot = seq_slot

    @property
    def blocks(self) -> list:
        return self._pool._seq_blocks(self.seq_slot)

    @property
    def live_blocks(self) -> list:
        return [b for b in self.blocks if b is not None]

    @property
    def num_tokens(self) -> int:
        return self._pool._lib.speckv_pool_seq_tokens(
            self._pool._h, self.seq_slot)


class _NativeTable(BlockTable):
    """BlockTable whose storage is the C++ pool's table, mapped zero-copy."""

    def __init__(self, pool: "NativeBlockPool",
                 max_seqs: int, max_blocks_per_seq: int):
        self.max_seqs = max_seqs
        self.max_blocks_per_seq = max_blocks_per_seq
        ptr = pool._lib.speckv_pool_table(pool._h)
        self._table = np.ctypeslib.as_array(
            ptr, shape=(max_seqs, max_blocks_per_seq))


class NativeBlockPool:
    """Drop-in replacement for `core.block_pool.BlockPool` over the C++
    allocator; must be paired with `NativeResidencyDirectory` (the C++ pool
    allocates/frees through the same underlying directory object)."""

    def __init__(self, config, directory: NativeResidencyDirectory,
                 max_seqs: int, max_blocks_per_seq: int):
        if not isinstance(directory, NativeResidencyDirectory):
            raise TypeError("NativeBlockPool requires the native directory")
        self.config = config
        self.directory = directory
        self._lib = load_library()
        self._h = self._lib.speckv_pool_create(
            directory._h, max_seqs, max_blocks_per_seq, config.block_size)
        if not self._h:
            raise RuntimeError("native pool creation failed")
        self.table = _NativeTable(self, max_seqs, max_blocks_per_seq)
        self._max_blocks = max_blocks_per_seq

    def __del__(self):
        try:
            self._lib.speckv_pool_destroy(self._h)
        except Exception:
            pass

    # -- sequence lifecycle -------------------------------------------------

    def add_seq(self):
        slot = self._lib.speckv_pool_add_seq(self._h)
        return None if slot < 0 else slot

    def free_seq(self, seq_slot: int) -> None:
        rc = self._lib.speckv_pool_free_seq(self._h, seq_slot)
        if rc < 0:
            raise KeyError(seq_slot)

    def retire_below(self, seq_slot: int, first_live_block: int):
        cap = self._max_blocks
        idx = (ctypes.c_int64 * cap)()
        bid = (ctypes.c_int64 * cap)()
        n = self._lib.speckv_pool_retire_below(
            self._h, seq_slot, first_live_block, idx, bid, cap)
        if n < 0:
            raise KeyError(seq_slot)
        return [(int(idx[i]), int(bid[i])) for i in range(min(n, cap))]

    def reap_deferred(self) -> None:
        self._lib.speckv_pool_reap_deferred(self._h)

    # -- capacity growth ----------------------------------------------------

    def blocks_needed(self, seq_slot: int, new_total_tokens: int) -> int:
        n = self._lib.speckv_pool_blocks_needed(
            self._h, seq_slot, new_total_tokens)
        if n < 0:
            raise KeyError(seq_slot)
        return n

    def extend(self, seq_slot: int, new_total_tokens: int) -> bool:
        rc = self._lib.speckv_pool_extend(self._h, seq_slot, new_total_tokens)
        if rc < 0:
            raise KeyError(seq_slot)
        return bool(rc)

    # -- accessors ----------------------------------------------------------

    def _seq_blocks(self, seq_slot: int) -> list:
        cap = self._max_blocks
        out = (ctypes.c_int64 * cap)()
        n = self._lib.speckv_pool_seq_blocks(self._h, seq_slot, out, cap)
        if n < 0:
            raise KeyError(seq_slot)
        return [None if out[i] < 0 else int(out[i])
                for i in range(min(n, cap))]

    def seq(self, seq_slot: int) -> _NativeSeqView:
        if not self._lib.speckv_pool_has_seq(self._h, seq_slot):
            raise KeyError(seq_slot)
        return _NativeSeqView(self, seq_slot)

    def live_seqs(self) -> list:
        cap = self.table.max_seqs
        out = (ctypes.c_int32 * cap)()
        n = self._lib.speckv_pool_live_seqs(self._h, out, cap)
        return [int(out[i]) for i in range(min(n, cap))]

    def last_block(self, seq_slot: int) -> int:
        bid = self._lib.speckv_pool_last_block(self._h, seq_slot)
        if bid < 0:
            raise KeyError(seq_slot)
        return bid

    def refresh_slot(self, seq_slot: int, block_idx: int) -> None:
        rc = self._lib.speckv_pool_refresh_slot(self._h, seq_slot, block_idx)
        if rc < 0:
            raise KeyError((seq_slot, block_idx))

    def locate(self, bid: int):
        idx = ctypes.c_int32()
        slot = self._lib.speckv_pool_locate(self._h, bid, ctypes.byref(idx))
        return None if slot < 0 else (int(slot), int(idx.value))

    def sync_moved(self) -> int:
        return self._lib.speckv_pool_sync_moved(self._h)

    def is_live(self, bid: int) -> bool:
        return bool(self._lib.speckv_pool_is_live(self._h, bid))

    def share_block(self, seq_slot: int, bid: int) -> None:
        rc = self._lib.speckv_pool_share_block(self._h, seq_slot, bid)
        if rc < 0:
            raise KeyError(f"share_block({seq_slot}, {bid}): {rc}")

    def get_statistics(self) -> PoolStatistics:
        out = (ctypes.c_int64 * 7)()
        rc = self._lib.speckv_pool_stats(self._h, out)
        if rc < 0:
            raise RuntimeError("pool stats failed")
        return PoolStatistics(**dict(zip(_POOL_STATS_FIELDS, out)))

    @property
    def stats(self) -> PoolStatistics:
        return self.get_statistics()

    def reset_statistics(self) -> None:
        self._lib.speckv_pool_reset_stats(self._h)
