"""Randomized lockstep fuzz: Python vs C++ residency directory.

Drives both implementations with an identical random operation stream and
asserts identical observable behavior at every step — states, slots, stats,
errors. This is the build's answer to the reference's hand-written 12-case
state machine suite: the full transition space, sampled.
"""

import numpy as np
import pytest

from cxl_speckv_tpu.config import CacheConfig
from cxl_speckv_tpu.core.directory import (
    BlockState,
    DirectoryError,
    ResidencyDirectory,
)

try:
    from cxl_speckv_tpu.native import NativeResidencyDirectory, native_available
    HAVE = native_available()
except Exception:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="native runtime unavailable")


def snapshot(d, bids):
    out = []
    for bid in bids:
        if bid in d:
            e = d.entry(bid)
            out.append((bid, e.state.name, e.hbm_slot, e.host_slot,
                        e.dirty, e.pinned, e.prefetched))
        else:
            out.append((bid, None))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_lockstep_fuzz(seed):
    cfg = CacheConfig(num_hbm_blocks=6, num_host_blocks=10,
                      prefetch_reserve_frac=0.2)
    py = ResidencyDirectory(cfg)
    cc = NativeResidencyDirectory(cfg)
    rng = np.random.RandomState(seed)
    live: list[int] = []

    def apply(d, op, bid, flag):
        """Returns (result, error_type_name) for comparison."""
        try:
            if op == 0:
                r = d.allocate(pinned=flag)
                return r, None
            if op == 1:
                return d.free(bid), None
            if op == 2:
                return d.access(bid).name, None
            if op == 3:
                return d.mark_dirty(bid), None
            if op == 4:
                return (d.pin(bid) if flag else d.unpin(bid)), None
            if op == 5:
                return d.start_promote(bid, prefetch=flag), None
            if op == 6:
                return d.complete_promote(bid), None
            if op == 7:
                r = d.start_demote(bid, eviction=flag)
                return r, None
            if op == 8:
                return d.complete_demote(bid), None
            if op == 9:
                return d.evict_candidates(3), None
            if op == 10:
                return d.cancel_demote(bid), None
        except DirectoryError:
            return None, "DirectoryError"

    for step in range(400):
        op = rng.randint(0, 11)
        bid = int(rng.choice(live)) if live and rng.rand() < 0.9 else int(rng.randint(0, 40))
        flag = bool(rng.randint(0, 2))

        r1, e1 = apply(py, op, bid, flag)
        r2, e2 = apply(cc, op, bid, flag)
        assert e1 == e2, f"step {step} op {op} bid {bid}: errors differ {e1} vs {e2}"
        assert r1 == r2, f"step {step} op {op} bid {bid}: results differ {r1} vs {r2}"

        if op == 0 and r1 is not None:
            live.append(r1)
        if op == 1 and e1 is None and bid in live:
            live.remove(bid)

        # observable state must match exactly
        assert snapshot(py, live[-12:]) == snapshot(cc, live[-12:]), f"step {step}"
        assert py.hbm_free == cc.hbm_free and py.host_free == cc.host_free
        assert py.hbm_pressure() == cc.hbm_pressure()

    s1, s2 = py.get_statistics().as_dict(), cc.get_statistics().as_dict()
    assert s1 == s2, f"stats diverged:\n{s1}\n{s2}"
    assert py.state_counts() == cc.state_counts()
    assert py.take_moved() == cc.take_moved()
