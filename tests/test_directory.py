"""Residency-directory state machine tests.

Port of the reference coherence suite's 12 state-transition cases
(`tests/test_coherence.cpp:59-402`) to the TPU block-residency model:
MESI {I,S,E,M} maps to {FREE, HOST, HBM clean, HBM dirty}; writeback M->S
maps to demote; promote/demote tier moves map directly; batch operations and
statistics coverage are mirrored.
"""

import pytest

from cxl_speckv_tpu.config import CacheConfig
from cxl_speckv_tpu.core.directory import (
    BlockState,
    DirectoryError,
    ResidencyDirectory,
)

# The same behavioral suite runs against the pure-Python directory and the
# native C++ one (native/speckv_runtime.cpp via ctypes) — they must be
# semantically indistinguishable.
try:
    from cxl_speckv_tpu.native import NativeResidencyDirectory, native_available
    _HAVE_NATIVE = native_available()
except Exception:
    _HAVE_NATIVE = False

IMPLS = ["python"] + (["native"] if _HAVE_NATIVE else [])
_IMPL = {"python": ResidencyDirectory}
if _HAVE_NATIVE:
    _IMPL["native"] = NativeResidencyDirectory


@pytest.fixture(params=IMPLS, autouse=True)
def impl(request):
    global _current_impl
    _current_impl = _IMPL[request.param]
    yield request.param


def make_dir(hbm=8, host=16, reserve=0.0):
    cfg = CacheConfig(num_hbm_blocks=hbm, num_host_blocks=host,
                      prefetch_reserve_frac=reserve)
    return _current_impl(cfg)


# 1. initialization (test_coherence.cpp "Initialization")
def test_init():
    d = make_dir()
    assert len(d) == 0
    assert d.hbm_free == 8
    assert d.host_free == 16
    assert d.state_counts()["HBM"] == 0


# 2. allocation lands in HBM, dirty (analog: first write -> MODIFIED)
def test_allocate_is_hbm_dirty():
    d = make_dir()
    bid = d.allocate()
    e = d.entry(bid)
    assert e.state == BlockState.HBM
    assert e.dirty and e.pinned
    assert d.hbm_free == 7
    assert d.stats.allocations == 1


# 3. read hit fast path (analog: read miss->SHARED then read hit)
def test_access_hit():
    d = make_dir()
    bid = d.allocate()
    assert d.access(bid) == BlockState.HBM
    assert d.stats.hbm_hits == 1
    assert d.stats.hit_rate == 1.0


# 4. dirty demote -> writeback flow (analog: writeback M->S, tier -> L3)
def test_dirty_demote_writeback():
    d = make_dir()
    bid = d.allocate()
    d.unpin(bid)
    res = d.start_demote(bid)
    assert res is not None
    hbm_slot, host_slot = res
    assert hbm_slot >= 0 and host_slot >= 0
    assert d.entry(bid).state == BlockState.IN_FLIGHT_DOWN
    # still readable mid-writeback (single-writer)
    assert d.access(bid) == BlockState.IN_FLIGHT_DOWN
    assert d.stats.hbm_hits == 1
    d.complete_demote(bid)
    e = d.entry(bid)
    assert e.state == BlockState.HOST and not e.dirty
    assert e.hbm_slot == -1 and e.host_slot == host_slot
    assert d.hbm_free == 8
    assert d.stats.demotions == 1


# 5. promote (analog: promote_to_l1)
def test_promote_roundtrip():
    d = make_dir()
    bid = d.allocate()
    d.unpin(bid)
    d.start_demote(bid)
    d.complete_demote(bid)
    host_slot, hbm_slot = d.start_promote(bid)
    assert d.entry(bid).state == BlockState.IN_FLIGHT_UP
    d.complete_promote(bid)
    e = d.entry(bid)
    assert e.state == BlockState.HBM and not e.dirty
    # host backing copy retained -> next demote is free
    assert e.host_slot == host_slot
    assert d.stats.promotions == 1


# 6. clean drop: demote of clean block with host copy is instantaneous
def test_clean_drop():
    d = make_dir()
    bid = d.allocate()
    d.unpin(bid)
    d.start_demote(bid)
    d.complete_demote(bid)
    d.start_promote(bid)
    d.complete_promote(bid)
    assert d.start_demote(bid) is None  # clean drop, no transfer
    assert d.entry(bid).state == BlockState.HOST
    assert d.stats.clean_drops == 1
    assert d.hbm_free == 8


# 7. append invalidates host copy (analog: write -> invalidate sharers -> M)
def test_mark_dirty_invalidates_host_copy():
    d = make_dir()
    bid = d.allocate()
    d.unpin(bid)
    d.start_demote(bid)
    d.complete_demote(bid)
    d.start_promote(bid)
    d.complete_promote(bid)
    host_free_before = d.host_free
    d.mark_dirty(bid)
    e = d.entry(bid)
    assert e.dirty and e.host_slot == -1
    assert d.host_free == host_free_before + 1
    # now demote requires a writeback again
    assert d.start_demote(bid) is not None


# 8. demand miss accounting (analog: read miss -> FPGA fetch)
def test_demand_miss():
    d = make_dir()
    bid = d.allocate()
    d.unpin(bid)
    d.start_demote(bid)
    d.complete_demote(bid)
    assert d.access(bid) == BlockState.HOST
    assert d.stats.demand_misses == 1
    assert d.stats.hit_rate == 0.0


# 9. pinned blocks refuse demote; illegal transitions raise
def test_illegal_transitions():
    d = make_dir()
    bid = d.allocate()
    with pytest.raises(DirectoryError):
        d.start_demote(bid)  # pinned
    d.unpin(bid)
    d.start_demote(bid)
    with pytest.raises(DirectoryError):
        d.start_demote(bid)  # already in flight
    with pytest.raises(DirectoryError):
        d.free(bid)  # mid-transfer
    with pytest.raises(DirectoryError):
        d.complete_promote(bid)  # wrong direction
    d.complete_demote(bid)
    with pytest.raises(DirectoryError):
        d.mark_dirty(bid)  # append to non-HBM block
    with pytest.raises(DirectoryError):
        d.entry(999)


# 10. batch demote/promote of many blocks (analog: batch_invalidate/writeback)
def test_batch_migrations():
    d = make_dir(hbm=8, host=16)
    bids = [d.allocate() for _ in range(8)]
    assert d.hbm_free == 0
    for b in bids[:4]:
        d.unpin(b)
        d.start_demote(b)
    for b in bids[:4]:
        d.complete_demote(b)
    assert d.hbm_free == 4
    assert d.stats.demotions == 4
    for b in bids[:4]:
        d.start_promote(b)
        d.complete_promote(b)
    assert d.hbm_free == 0
    assert d.stats.promotions == 4


# 11. statistics get/reset (analog: "statistics + reset" case)
def test_statistics_reset():
    d = make_dir()
    bid = d.allocate()
    d.access(bid)
    s = d.get_statistics()
    assert s.accesses == 1 and s.allocations == 1
    assert "hit_rate" in s.as_dict()
    d.reset_statistics()
    assert d.stats.accesses == 0 and d.stats.allocations == 0


# 12. full transition chain (analog: "full MESI transition chain" :341-378)
def test_full_chain():
    d = make_dir()
    bid = d.allocate()               # FREE -> HBM dirty   (I -> M)
    d.access(bid)                    # hit                 (M read hit)
    d.unpin(bid)
    d.start_demote(bid)              # -> IN_FLIGHT_DOWN   (M writeback)
    d.complete_demote(bid)           # -> HOST             (-> S in L3)
    d.access(bid)                    # demand miss
    d.start_promote(bid)             # -> IN_FLIGHT_UP
    assert d.access(bid) == BlockState.IN_FLIGHT_UP
    assert d.stats.inflight_hits == 1
    d.complete_promote(bid)          # -> HBM clean        (-> S in L1)
    d.mark_dirty(bid)                # append              (S -> M, invalidate)
    d.unpin(bid)
    d.start_demote(bid)
    d.complete_demote(bid)
    d.free(bid)                      # -> FREE             (-> I)
    assert len(d) == 0
    assert d.hbm_free == 8 and d.host_free == 16


# 13. many independent blocks (analog: "10 independent addresses")
def test_many_blocks():
    d = make_dir(hbm=16, host=16)
    bids = [d.allocate() for _ in range(10)]
    assert len(set(d.entry(b).hbm_slot for b in bids)) == 10
    for b in bids:
        d.access(b)
    assert d.stats.hit_rate == 1.0
    for b in bids:
        d.unpin(b)
        d.free(b)
    assert d.hbm_free == 16


# -- beyond the reference suite: eviction policy + OOM backpressure ----------

def test_oom_returns_none():
    d = make_dir(hbm=2, host=4)
    b1, b2 = d.allocate(), d.allocate()
    assert b1 is not None and b2 is not None
    assert d.allocate() is None  # both pinned+dirty: nothing reclaimable
    assert d.stats.oom_events == 1


def test_allocate_reclaims_clean_blocks():
    d = make_dir(hbm=2, host=4)
    b1 = d.allocate()
    d.allocate()
    d.unpin(b1)
    d.start_demote(b1)
    d.complete_demote(b1)
    d.start_promote(b1)
    d.complete_promote(b1)  # b1 now clean HBM with host backing
    b3 = d.allocate()       # should clean-drop b1 to make room
    assert b3 is not None
    assert d.entry(b1).state == BlockState.HOST
    assert d.stats.clean_drops == 1


def test_evict_candidates_order():
    d = make_dir(hbm=4, host=8)
    bids = [d.allocate() for _ in range(4)]
    for b in bids:
        d.unpin(b)
    # bids[3] is hot
    for _ in range(20):
        d.access(bids[3])
    # bids[1] most recently accessed of the cold ones
    d.access(bids[0])
    d.access(bids[2])
    d.access(bids[1])
    cand = d.evict_candidates(3)
    assert cand == [bids[0], bids[2], bids[1]]
    # hot block chosen last
    assert d.evict_candidates(4)[-1] == bids[3]


def test_prefetch_accounting():
    d = make_dir()
    good, bad = d.allocate(), d.allocate()
    for b in (good, bad):
        d.unpin(b)
        d.start_demote(b)
        d.complete_demote(b)
        d.start_promote(b, prefetch=True)
        d.complete_promote(b)
    d.access(good)                    # prefetch hit
    d.start_demote(bad)               # clean drop, never accessed -> wasted
    assert d.stats.prefetch_fills == 2
    assert d.stats.prefetch_hits == 1
    assert d.stats.prefetch_wasted == 1
    assert d.stats.prefetch_accuracy == 0.5


def test_pressure_and_dump():
    cfg = CacheConfig(num_hbm_blocks=8, num_host_blocks=8, prefetch_reserve_frac=0.25)
    d = ResidencyDirectory(cfg)
    assert cfg.num_reserved_blocks == 2
    for _ in range(7):
        d.allocate()
    assert d.hbm_pressure() == 1
    text = d.dump_state()
    assert "hbm_free=1/8" in text


def test_cancel_demote():
    """Queued-writeback cancellation: IN_FLIGHT_DOWN -> HBM, host slot
    released (a dirty writeback implies any prior host copy was stale)."""
    d = make_dir()
    bid = d.allocate()
    d.unpin(bid)
    assert d.start_demote(bid) is not None
    host_free_mid = d.host_free
    d.cancel_demote(bid)
    e = d.entry(bid)
    assert e.state == BlockState.HBM and e.host_slot == -1 and e.dirty
    assert d.host_free == host_free_mid + 1
    with pytest.raises(DirectoryError):
        d.cancel_demote(bid)  # not in flight anymore
    # block remains fully usable
    d.access(bid)
    d.start_demote(bid)
    d.complete_demote(bid)
    d.free(bid)
