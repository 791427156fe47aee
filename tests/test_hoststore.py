"""Device-side host store: in-graph migration round-trips.

The device-backend analog of test_transfer.py (which covers the legacy
numpy/staged path): block data moves HBM<->host-tier entirely inside
migrate programs, completing at dispatch. Verifies content round-trips,
pad-lane harmlessness, demand-fetch, and that the engine's oversubscription
invariant holds on this backend (it is the default).
"""

import jax.numpy as jnp
import numpy as np

from cxl_speckv_tpu.config import CacheConfig, KVDtype
from cxl_speckv_tpu.core.directory import BlockState
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.runtime.kv_cache import TieredKVCache


def make_cache(hbm=8, host=16, bs=8, kv_dtype=KVDtype.INT8):
    cc = CacheConfig(block_size=bs, num_hbm_blocks=hbm, num_host_blocks=host,
                     kv_dtype=kv_dtype, prefetch_reserve_frac=0.25,
                     host_store_backend="device")
    mc = tiny_test_config()
    kvc = TieredKVCache(cc, mc, max_seqs=4, max_blocks_per_seq=8)
    assert kvc.store is not None and kvc.host is None
    return kvc


def fill_block(kvc, seq, block_idx, value):
    bid = kvc.pool.seq(seq).blocks[block_idx]
    slot = kvc.directory.entry(bid).hbm_slot
    k, v, ks, vs = kvc.pools
    k = k.at[:, slot].set(jnp.full(k.shape[2:], value, k.dtype))
    ks = ks.at[:, slot].set(float(value))
    kvc.set_pools((k, v, ks, vs))
    kvc.directory.mark_dirty(bid)
    return bid, slot


def read_block(kvc, bid):
    """K-pool contents + scale of an HBM-resident block (layer 0, head 0)."""
    slot = kvc.directory.entry(bid).hbm_slot
    assert slot >= 0
    k = np.asarray(kvc.pools[0])
    ks = np.asarray(kvc.pools[2])
    return k[0, slot, 0], ks[0, slot].max()


def test_demote_promote_roundtrip():
    kvc = make_cache()
    s = kvc.add_seq()
    assert kvc.extend_seq(s, 16)  # 2 blocks
    bid, slot = fill_block(kvc, s, 0, 7)
    kvc.pin_seq(s, False)

    res = kvc.directory.start_demote(bid)
    assert res is not None  # dirty -> real writeback
    kvc.transfer.enqueue_demote(bid, *res)
    assert kvc.dispatch_migrations() == 1
    assert kvc.directory.entry(bid).state == BlockState.HOST

    # promote back into a (possibly different) slot; contents must survive
    host_slot, hbm_slot = kvc.directory.start_promote(bid)
    kvc.transfer.enqueue_promote(bid, host_slot, hbm_slot)
    assert kvc.dispatch_migrations() == 1
    assert kvc.directory.entry(bid).state == BlockState.HBM
    data, scale = read_block(kvc, bid)
    np.testing.assert_array_equal(data, np.full_like(data, 7))
    assert scale == 7.0
    st = kvc.transfer.get_statistics()
    assert st.up_transfers == st.down_transfers == 1
    assert st.bytes_up == st.bytes_down == kvc.store.bytes_per_block


def test_mixed_batch_with_pads():
    """One migrate program carrying both directions + pad lanes."""
    kvc = make_cache()
    s = kvc.add_seq()
    assert kvc.extend_seq(s, 32)  # 4 blocks
    bids = list(kvc.pool.seq(s).blocks)
    for i, b in enumerate(bids):
        fill_block(kvc, s, i, i + 1)
    kvc.pin_seq(s, False)
    # demote all four
    for b in bids:
        res = kvc.directory.start_demote(b)
        kvc.transfer.enqueue_demote(b, *res)
    assert kvc.dispatch_migrations() == 4
    # promote two back while demoting nothing: mixed with pads
    for b in bids[:2]:
        hs, ds = kvc.directory.start_promote(b)
        kvc.transfer.enqueue_promote(b, hs, ds)
    assert kvc.dispatch_migrations() == 2
    for i, b in enumerate(bids[:2]):
        data, scale = read_block(kvc, b)
        np.testing.assert_array_equal(data, np.full_like(data, i + 1))
        assert scale == float(i + 1)
    # the two still-host blocks round-trip later, unharmed by pad lanes
    for b in bids[2:]:
        hs, ds = kvc.directory.start_promote(b)
        kvc.transfer.enqueue_promote(b, hs, ds)
    kvc.dispatch_migrations()
    for i, b in enumerate(bids[2:], start=2):
        data, _ = read_block(kvc, b)
        np.testing.assert_array_equal(data, np.full_like(data, i + 1))


def test_ensure_resident_demand_fetch():
    kvc = make_cache()
    s = kvc.add_seq()
    assert kvc.extend_seq(s, 24)
    for i in range(3):
        fill_block(kvc, s, i, 10 + i)
    kvc.pin_seq(s, False)
    for b in kvc.pool.seq(s).blocks:
        res = kvc.directory.start_demote(b)
        kvc.transfer.enqueue_demote(b, *res)
    kvc.dispatch_migrations()
    assert kvc.seq_nonresident_blocks(s) == list(kvc.pool.seq(s).blocks)

    fetched = kvc.ensure_resident([s])
    assert fetched == 3
    assert not kvc.seq_nonresident_blocks(s)
    # table rows updated to the new physical slots
    for i, b in enumerate(kvc.pool.seq(s).blocks):
        assert kvc.pool.table.get(s, i) == kvc.directory.entry(b).hbm_slot
        data, _ = read_block(kvc, b)
        np.testing.assert_array_equal(data, np.full_like(data, 10 + i))
    assert kvc.stats.demand_fetch_blocks == 3


def test_cancel_queued_demote():
    kvc = make_cache()
    s = kvc.add_seq()
    assert kvc.extend_seq(s, 8)
    bid, _ = fill_block(kvc, s, 0, 3)
    kvc.pin_seq(s, False)
    res = kvc.directory.start_demote(bid)
    kvc.transfer.enqueue_demote(bid, *res)
    assert kvc.directory.entry(bid).state == BlockState.IN_FLIGHT_DOWN
    # demand path cancels the queued writeback without any data motion
    assert kvc.ensure_resident([s]) == 0
    assert kvc.directory.entry(bid).state == BlockState.HBM
    data, _ = read_block(kvc, bid)
    np.testing.assert_array_equal(data, np.full_like(data, 3))


def test_eviction_under_pressure_frees_slots():
    """extend_seq beyond HBM capacity succeeds by demoting (dispatch
    completes synchronously — no poll/wait path exists on this backend)."""
    kvc = make_cache(hbm=4, host=16)
    s1 = kvc.add_seq()
    assert kvc.extend_seq(s1, 32)  # all 4 HBM blocks
    kvc.pin_seq(s1, False)
    s2 = kvc.add_seq()
    assert kvc.extend_seq(s2, 16)  # forces eviction of s1 blocks
    assert len(kvc.seq_nonresident_blocks(s1)) >= 2
    st = kvc.transfer.get_statistics()
    assert st.down_transfers + kvc.directory.get_statistics().clean_drops >= 2
