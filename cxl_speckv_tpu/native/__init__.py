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
