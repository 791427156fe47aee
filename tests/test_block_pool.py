"""Block pool + block table tests (analog of `tests/test_allocator.cpp`)."""

import numpy as np

from cxl_speckv_tpu.config import CacheConfig
from cxl_speckv_tpu.core.block_pool import BlockPool
from cxl_speckv_tpu.core.block_table import INVALID_SLOT, BlockTable
from cxl_speckv_tpu.core.directory import BlockState, ResidencyDirectory


def make_pool(hbm=16, host=32, block_size=8, max_seqs=4, max_blocks=8):
    cfg = CacheConfig(num_hbm_blocks=hbm, num_host_blocks=host,
                      block_size=block_size, prefetch_reserve_frac=0.0)
    d = ResidencyDirectory(cfg)
    return BlockPool(cfg, d, max_seqs, max_blocks), d


def test_basic_alloc_free():
    pool, d = make_pool()
    s = pool.add_seq()
    assert pool.extend(s, 20)  # 20 tokens / 8 per block -> 3 blocks
    assert len(pool.seq(s).blocks) == 3
    assert d.hbm_free == 13
    pool.free_seq(s)
    assert d.hbm_free == 16
    assert pool.stats.blocks_allocated == 3
    assert pool.stats.blocks_freed == 3


def test_extend_is_incremental():
    pool, _ = make_pool()
    s = pool.add_seq()
    pool.extend(s, 8)
    assert len(pool.seq(s).blocks) == 1
    pool.extend(s, 9)
    assert len(pool.seq(s).blocks) == 2
    pool.extend(s, 16)  # still 2 blocks
    assert len(pool.seq(s).blocks) == 2


def test_table_mirrors_slots():
    pool, d = make_pool()
    s = pool.add_seq()
    pool.extend(s, 24)
    for i, bid in enumerate(pool.seq(s).blocks):
        assert pool.table.get(s, i) == d.entry(bid).hbm_slot
    assert pool.table.get(s, 3) == INVALID_SLOT


def test_oom_and_slot_exhaustion():
    pool, _ = make_pool(hbm=2, max_seqs=1, max_blocks=8)
    s = pool.add_seq()
    assert pool.add_seq() is None  # one seq slot only
    assert pool.extend(s, 16)      # 2 blocks = all of HBM
    assert not pool.extend(s, 24)  # OOM
    assert pool.stats.alloc_failures == 1


def test_deferred_free_mid_transfer():
    pool, d = make_pool()
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


def test_refresh_slot_after_migration():
    pool, d = make_pool()
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
