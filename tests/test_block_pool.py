"""Block pool + block table tests (analog of `tests/test_allocator.cpp`).

Every pool test runs against BOTH the pure-Python BlockPool and the native
C++ pool (`native/speckv_runtime.cpp::BlockPool`, the SpeckvAllocator
analog) — same fixture parametrization pattern as test_directory.py.
"""

import numpy as np
import pytest

from cxl_speckv_tpu.config import CacheConfig
from cxl_speckv_tpu.core.block_pool import BlockPool
from cxl_speckv_tpu.core.block_table import INVALID_SLOT, BlockTable
from cxl_speckv_tpu.core.directory import BlockState, ResidencyDirectory

try:
    from cxl_speckv_tpu.native import (
        NativeBlockPool,
        NativeResidencyDirectory,
        native_available,
    )
    HAVE_NATIVE = native_available()
except Exception:
    HAVE_NATIVE = False

BACKENDS = ["python"] + (["native"] if HAVE_NATIVE else [])


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


def make_pool(hbm=16, host=32, block_size=8, max_seqs=4, max_blocks=8,
              backend="python"):
    cfg = CacheConfig(num_hbm_blocks=hbm, num_host_blocks=host,
                      block_size=block_size, prefetch_reserve_frac=0.0)
    if backend == "native":
        d = NativeResidencyDirectory(cfg)
        return NativeBlockPool(cfg, d, max_seqs, max_blocks), d
    d = ResidencyDirectory(cfg)
    return BlockPool(cfg, d, max_seqs, max_blocks), d


def test_basic_alloc_free(backend):
    pool, d = make_pool(backend=backend)
    s = pool.add_seq()
    assert pool.extend(s, 20)  # 20 tokens / 8 per block -> 3 blocks
    assert len(pool.seq(s).blocks) == 3
    assert d.hbm_free == 13
    pool.free_seq(s)
    assert d.hbm_free == 16
    assert pool.stats.blocks_allocated == 3
    assert pool.stats.blocks_freed == 3


def test_extend_is_incremental(backend):
    pool, _ = make_pool(backend=backend)
    s = pool.add_seq()
    pool.extend(s, 8)
    assert len(pool.seq(s).blocks) == 1
    pool.extend(s, 9)
    assert len(pool.seq(s).blocks) == 2
    pool.extend(s, 16)  # still 2 blocks
    assert len(pool.seq(s).blocks) == 2


def test_table_mirrors_slots(backend):
    pool, d = make_pool(backend=backend)
    s = pool.add_seq()
    pool.extend(s, 24)
    for i, bid in enumerate(pool.seq(s).blocks):
        assert pool.table.get(s, i) == d.entry(bid).hbm_slot
    assert pool.table.get(s, 3) == INVALID_SLOT


def test_oom_and_slot_exhaustion(backend):
    pool, _ = make_pool(hbm=2, max_seqs=1, max_blocks=8, backend=backend)
    s = pool.add_seq()
    assert pool.add_seq() is None  # one seq slot only
    assert pool.extend(s, 16)      # 2 blocks = all of HBM
    assert not pool.extend(s, 24)  # OOM
    assert pool.stats.alloc_failures == 1


def test_deferred_free_mid_transfer(backend):
    pool, d = make_pool(backend=backend)
    s = pool.add_seq()
    pool.extend(s, 8)
    bid = pool.seq(s).blocks[0]
    d.unpin(bid)
    d.start_demote(bid)
    pool.free_seq(s)  # block mid-transfer: deferred
    assert bid in d
    d.complete_demote(bid)
    pool.reap_deferred()
    assert bid not in d


def test_refresh_slot_after_migration(backend):
    pool, d = make_pool(backend=backend)
    s = pool.add_seq()
    pool.extend(s, 8)
    bid = pool.seq(s).blocks[0]
    d.unpin(bid)
    d.start_demote(bid)
    d.complete_demote(bid)
    d.start_promote(bid)
    d.complete_promote(bid)
    pool.refresh_slot(s, 0)
    assert pool.table.get(s, 0) == d.entry(bid).hbm_slot


def test_table_rows_and_clear():
    t = BlockTable(max_seqs=2, max_blocks_per_seq=4)
    t.set(0, 0, 5)
    t.set(1, 2, 7)
    assert t.get(0, 0) == 5
    assert list(t.row(1)) == [-1, -1, 7, -1]
    t.clear_row(1)
    assert t.get(1, 2) == -1
    assert t.host_array.shape == (2, 4)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native runtime unavailable")
def test_pool_lockstep_fuzz():
    """Python and C++ pools driven with an IDENTICAL random op stream stay
    byte-identical: same return values, same table contents, same stats,
    same directory counters (the pool fuzz analog of
    tests/test_directory_fuzz.py)."""
    rng = np.random.RandomState(7)
    pools = [make_pool(hbm=8, host=16, max_seqs=4, max_blocks=6, backend=b)
             for b in ("python", "native")]
    live: list[int] = []
    tokens: dict[int, int] = {}

    def both(fn):
        a = fn(*pools[0])
        b = fn(*pools[1])
        assert a == b, f"divergence: {a!r} != {b!r}"
        return a

    for step in range(400):
        op = rng.randint(6)
        if op == 0:  # add_seq
            s = both(lambda p, d: p.add_seq())
            if s is not None:
                live.append(s)
                tokens[s] = 0
        elif op == 1 and live:  # extend (clamped to table capacity, as the
            s = live[rng.randint(len(live))]    # scheduler's admission does)
            tokens[s] = min(tokens[s] + int(rng.randint(1, 20)), 6 * 8)
            both(lambda p, d: p.extend(s, tokens[s]))
        elif op == 2 and live:  # free_seq
            s = live.pop(rng.randint(len(live)))
            tokens.pop(s)
            both(lambda p, d: p.free_seq(s))
        elif op == 3 and live:  # retire below a window edge
            s = live[rng.randint(len(live))]
            first = int(rng.randint(0, 4))
            both(lambda p, d: p.retire_below(s, first))
        elif op == 4 and live:  # demote the LRU candidate + reap
            def demote(p, d):
                cands = d.evict_candidates(1)
                if not cands:
                    return None
                bid = cands[0]
                r = d.start_demote(bid, eviction=True)
                if r is not None:
                    d.complete_demote(bid)
                return (bid, r)
            both(demote)
            both(lambda p, d: p.reap_deferred() or p.sync_moved())
        elif op == 5 and live:  # inspect a sequence
            s = live[rng.randint(len(live))]
            both(lambda p, d: (p.seq(s).blocks, p.seq(s).num_tokens,
                               p.blocks_needed(s, tokens[s] + 5)))
        if rng.rand() < 0.15 and len(live) >= 2:  # share a prefix block
            src_s, dst_s = rng.choice(live, 2, replace=False)
            src_blocks = pools[0][0].seq(int(src_s)).blocks
            dst_len = len(pools[0][0].seq(int(dst_s)).blocks)
            if (dst_len < len(src_blocks)
                    and src_blocks[dst_len] is not None and dst_len < 5):
                bid = src_blocks[dst_len]
                both(lambda p, d: p.share_block(int(dst_s), bid))
                tokens[int(dst_s)] = (dst_len + 1) * 8

        both(lambda p, d: sorted(p.live_seqs()))
        assert np.array_equal(pools[0][0].table.host_array,
                              pools[1][0].table.host_array), step

    a, b = pools[0][0].get_statistics(), pools[1][0].get_statistics()
    assert a.as_dict() == b.as_dict()
    da, db = pools[0][1].get_statistics(), pools[1][1].get_statistics()
    assert da.as_dict() == db.as_dict()
