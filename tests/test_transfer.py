"""Transfer engine + tiered KV cache: data round-trips between tiers.

Analog of the reference DMA tests (`tests/test_dma.c`): submit batches both
directions, poll completion, verify contents — but with real data movement
(the reference could only check ioctl plumbing).
"""

import jax.numpy as jnp
import numpy as np

from cxl_speckv_tpu.config import CacheConfig, KVDtype
from cxl_speckv_tpu.core.directory import BlockState
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.runtime.kv_cache import TieredKVCache


def make_cache(hbm=8, host=16, bs=8, kv_dtype=KVDtype.INT8):
    # these tests exercise the legacy numpy/staged TransferEngine directly
    # (flush/poll/host-store contents); the device backend has its own suite
    # in test_hoststore.py
    cc = CacheConfig(block_size=bs, num_hbm_blocks=hbm, num_host_blocks=host,
                     kv_dtype=kv_dtype, prefetch_reserve_frac=0.25,
                     host_store_backend="numpy")
    mc = tiny_test_config()
    return TieredKVCache(cc, mc, max_seqs=4, max_blocks_per_seq=8)


def fill_block(kvc, seq, block_idx, value):
    """Write a recognizable constant into one block's K pool (all layers)."""
    bid = kvc.pool.seq(seq).blocks[block_idx]
    slot = kvc.directory.entry(bid).hbm_slot
    k, v, ks, vs = kvc.pools
    k = k.at[:, slot].set(jnp.full(k.shape[2:], value, k.dtype))
    ks = ks.at[:, slot].set(float(value))
    kvc.set_pools((k, v, ks, vs))
    kvc.directory.mark_dirty(bid)
    return bid, slot


def test_demote_promote_roundtrip():
    kvc = make_cache()
    s = kvc.add_seq()
    assert kvc.extend_seq(s, 16)  # 2 blocks
    bid, slot = fill_block(kvc, s, 0, 7)
    kvc.pin_seq(s, False)

    # demote block 0 (dirty -> real writeback)
    res = kvc.directory.start_demote(bid)
    assert res is not None
    kvc.transfer.enqueue_demote(bid, *res)
    kvc.set_pools(kvc.transfer.flush(kvc.pools, kvc.directory))
    kvc.transfer.poll(kvc.directory, wait=True)
    e = kvc.directory.entry(bid)
    assert e.state == BlockState.HOST
    np.testing.assert_array_equal(kvc.host.k[e.host_slot, 0, 0],
                                  np.full(kvc.host.k.shape[3:], 7))
    assert kvc.host.ks[e.host_slot].max() == 7.0

    # overwrite the HBM slot it used to occupy, then promote back
    host_slot, hbm_slot = kvc.directory.start_promote(bid)
    kvc.transfer.enqueue_promote(bid, host_slot, hbm_slot)
    kvc.set_pools(kvc.transfer.flush(kvc.pools, kvc.directory, wait_up=True))
    assert kvc.directory.entry(bid).state == BlockState.HBM
    got = np.asarray(kvc.pools[0][:, hbm_slot])
    np.testing.assert_array_equal(got, np.full_like(got, 7))
    st = kvc.transfer.get_statistics()
    assert st.up_transfers == 1 and st.down_transfers == 1
    assert st.bytes_up == st.bytes_down == kvc.host.bytes_per_block


def test_batched_migrations_preserve_distinct_contents():
    kvc = make_cache()
    s = kvc.add_seq()
    kvc.extend_seq(s, 32)  # 4 blocks
    bids = []
    for i in range(4):
        bid, _ = fill_block(kvc, s, i, i + 1)
        bids.append(bid)
    kvc.pin_seq(s, False)
    for bid in bids:
        res = kvc.directory.start_demote(bid)
        kvc.transfer.enqueue_demote(bid, *res)
    kvc.set_pools(kvc.transfer.flush(kvc.pools, kvc.directory))
    kvc.transfer.poll(kvc.directory, wait=True)
    for i, bid in enumerate(bids):
        e = kvc.directory.entry(bid)
        assert kvc.host.k[e.host_slot, 0, 0, 0, 0] == i + 1
    # promote all in one batch (bucketed to 4)
    for bid in bids:
        kvc.transfer.enqueue_promote(bid, kvc.directory.entry(bid).host_slot,
                                     kvc.directory.start_promote(bid)[1])
    kvc.set_pools(kvc.transfer.flush(kvc.pools, kvc.directory, wait_up=True))
    for i, bid in enumerate(bids):
        slot = kvc.directory.entry(bid).hbm_slot
        assert np.asarray(kvc.pools[0])[0, slot, 0, 0] == i + 1


def test_ensure_resident_demand_fetch():
    kvc = make_cache()
    s = kvc.add_seq()
    kvc.extend_seq(s, 24)
    bid, _ = fill_block(kvc, s, 1, 5)
    kvc.pin_seq(s, False)
    res = kvc.directory.start_demote(bid)
    kvc.transfer.enqueue_demote(bid, *res)
    kvc.set_pools(kvc.transfer.flush(kvc.pools, kvc.directory))
    kvc.transfer.poll(kvc.directory, wait=True)
    assert kvc.seq_nonresident_blocks(s) == [bid]

    fetched = kvc.ensure_resident([s])
    assert fetched == 1
    assert kvc.seq_nonresident_blocks(s) == []
    assert kvc.stats.demand_fetch_blocks == 1
    # block table row must point at the new physical slot
    e = kvc.directory.entry(bid)
    assert kvc.pool.table.get(s, 1) == e.hbm_slot
    # contents survived the round trip
    assert np.asarray(kvc.pools[0])[0, e.hbm_slot, 0, 0] == 5


def test_maintain_restores_landing_zone():
    kvc = make_cache(hbm=8, host=16)  # reserve = 2
    s = kvc.add_seq()
    kvc.extend_seq(s, 7 * 8)  # 7 blocks -> hbm_free=1 < reserve
    kvc.pin_seq(s, False)
    assert kvc.directory.hbm_pressure() == 1
    kvc.maintain()
    kvc.transfer.poll(kvc.directory, wait=True)
    assert kvc.directory.hbm_pressure() == 0
    assert kvc.stats.maintain_demotes >= 1


def test_prefetch_path_counts_hits():
    kvc = make_cache()
    s = kvc.add_seq()
    kvc.extend_seq(s, 16)
    kvc.pin_seq(s, False)
    bid = kvc.pool.seq(s).blocks[0]
    kvc.directory.entry(bid).dirty = True  # force writeback path
    res = kvc.directory.start_demote(bid)
    kvc.transfer.enqueue_demote(bid, *res)
    kvc.set_pools(kvc.transfer.flush(kvc.pools, kvc.directory))
    kvc.transfer.poll(kvc.directory, wait=True)

    assert kvc.prefetch_blocks([bid]) == 1
    kvc.set_pools(kvc.transfer.flush(kvc.pools, kvc.directory))
    assert kvc.directory.entry(bid).prefetched
    kvc.touch_seq(s)
    st = kvc.directory.get_statistics()
    assert st.prefetch_hits == 1
    assert st.hit_rate == 1.0


def test_oom_extend_evicts():
    kvc = make_cache(hbm=4, host=16)
    s1 = kvc.add_seq()
    assert kvc.extend_seq(s1, 3 * 8)
    kvc.pin_seq(s1, False)  # s1 inactive -> evictable
    s2 = kvc.add_seq()
    assert kvc.extend_seq(s2, 2 * 8)  # needs eviction of s1 blocks
    assert kvc.pool.stats.alloc_failures == 0
    assert len(kvc.pool.seq(s2).blocks) == 2
