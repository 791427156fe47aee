"""Multi-turn session tests: KV persistence, restore vs re-prefill.

The serving pattern the reference system exists for: a conversation's KV
stays in the pooled tier between turns and is *restored* (promoted from
host DRAM) instead of recomputed. Invariant: a restored continuation emits
exactly the tokens a from-scratch request over the full concatenated
history would emit (greedy).
"""

import numpy as np

from cxl_speckv_tpu.config import (
    CacheConfig,
    EngineConfig,
    KVDtype,
    PrefetchConfig,
    SystemConfig,
)
from cxl_speckv_tpu.engine.engine import Engine

import jax

from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import init_params

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))


def make_engine(hbm_blocks=256, host_blocks=256, batch=2, horizon=1):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm_blocks,
                          num_host_blocks=host_blocks, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=batch, max_seq_len=128,
                            prefill_chunk=32, decode_horizon=horizon),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)


def turn_tokens(seed, n):
    return np.random.RandomState(seed).randint(1, 256, n).tolist()


def reference_two_turn(t1, gen1, t2, gen2):
    """Ground truth: turn 2 as a fresh request over the full history."""
    eng = make_engine()
    sid = eng.add_request(t1, max_new_tokens=gen1, session=True)
    out1 = {o.req_id: o for o in eng.run()}[sid]
    full = t1 + out1.tokens + t2
    eng2 = make_engine()
    rid = eng2.add_request(full, max_new_tokens=gen2)
    out2 = {o.req_id: o for o in eng2.run()}[rid]
    return out1.tokens, out2.tokens


def test_session_restore_matches_fresh():
    t1, t2 = turn_tokens(1, 12), turn_tokens(2, 9)
    want1, want2 = reference_two_turn(t1, 8, t2, 8)

    eng = make_engine()
    sid = eng.add_request(t1, max_new_tokens=8, session=True)
    got1 = {o.req_id: o for o in eng.run()}[sid].tokens
    assert got1 == want1
    rid2 = eng.continue_session(sid, t2, max_new_tokens=8)
    got2 = {o.req_id: o for o in eng.run()}[rid2].tokens
    assert got2 == want2, "restored continuation diverged from full re-prefill"
    sess = eng.get_session(sid)
    assert sess.restores == 1 and sess.reprefills == 0
    assert sess.tokens == t1 + got1 + t2 + got2


def test_session_restore_under_tiering():
    """Idle session KV demoted to host between turns must restore correctly."""
    t1, t2 = turn_tokens(3, 16), turn_tokens(4, 10)
    want1, want2 = reference_two_turn(t1, 8, t2, 8)

    eng = make_engine(hbm_blocks=10, host_blocks=256)  # tiny HBM
    sid = eng.add_request(t1, max_new_tokens=8, session=True)
    got1 = {o.req_id: o for o in eng.run()}[sid].tokens
    assert got1 == want1
    # churn: unrelated requests force the idle session's blocks to host
    for i in range(3):
        eng.add_request(turn_tokens(50 + i, 14), max_new_tokens=6)
    eng.run()
    rid2 = eng.continue_session(sid, t2, max_new_tokens=8)
    got2 = {o.req_id: o for o in eng.run()}[rid2].tokens
    assert got2 == want2
    st = eng.get_statistics()
    assert st["transfer"]["up_transfers"] > 0


def test_session_reclaim_reprefills():
    """A reclaimed session transparently re-prefills and still matches."""
    t1, t2 = turn_tokens(5, 10), turn_tokens(6, 7)
    want1, want2 = reference_two_turn(t1, 6, t2, 6)

    eng = make_engine()
    sid = eng.add_request(t1, max_new_tokens=6, session=True)
    got1 = {o.req_id: o for o in eng.run()}[sid].tokens
    assert got1 == want1
    # simulate capacity pressure reclaiming the idle session
    assert eng._reclaim_idle_session()
    sess = eng.get_session(sid)
    assert not sess.live
    rid2 = eng.continue_session(sid, t2, max_new_tokens=6)
    got2 = {o.req_id: o for o in eng.run()}[rid2].tokens
    assert got2 == want2
    assert sess.reprefills == 1
    assert sess.live  # re-established after the turn


def test_session_capacity_gating_reclaims_idle():
    """Non-session traffic under pressure reclaims idle sessions rather
    than failing."""
    eng = make_engine(hbm_blocks=12, host_blocks=0)  # HBM-only
    sid = eng.add_request(turn_tokens(7, 20), max_new_tokens=6, session=True)
    eng.run()
    assert eng.get_session(sid).live
    # this request needs more blocks than remain; idle session must yield
    eng.add_request(turn_tokens(8, 70), max_new_tokens=8)
    outs = eng.run()
    assert len(outs) == 1 and outs[0].finish_reason == "length"
    assert not eng.get_session(sid).live  # reclaimed


def stream_engine(hbm=6, host=256, max_seq=64):
    """Engine where a 40-token prompt exceeds the pooled path's capacity
    (routes host-streamed)."""
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=max_seq,
                            prefill_chunk=16),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)


def test_stream_session_restore_matches_fresh():
    """A session whose KV lives as host-tier STREAM blocks (r4): each
    continuation appends to the stream blocks and must match a fresh
    full-history request on an ample pooled engine token-for-token."""
    t1, t2, t3 = turn_tokens(11, 40), turn_tokens(12, 9), turn_tokens(13, 7)

    eng = stream_engine()
    sid = eng.add_request(t1, max_new_tokens=8, session=True)
    assert sid in {r.req_id for r in eng._stream_queue}
    got1 = {o.req_id: o for o in eng.run()}[sid].tokens
    sess = eng.get_session(sid)
    assert sess.live and sess.stream_bids, "session should be stream-resident"
    rid2 = eng.continue_session(sid, t2, max_new_tokens=8)
    got2 = {o.req_id: o for o in eng.run()}[rid2].tokens
    assert sess.restores == 1 and sess.reprefills == 0
    rid3 = eng.continue_session(sid, t3, max_new_tokens=8)
    got3 = {o.req_id: o for o in eng.run()}[rid3].tokens
    assert sess.tokens == t1 + got1 + t2 + got2 + t3 + got3

    # ground truth: each turn as a fresh full-history request, ample pooled
    ample = make_engine()
    a1 = ample.add_request(t1, max_new_tokens=8)
    want1 = {o.req_id: o for o in ample.run()}[a1].tokens
    a2 = ample.add_request(t1 + want1 + t2, max_new_tokens=8)
    want2 = {o.req_id: o for o in ample.run()}[a2].tokens
    a3 = ample.add_request(t1 + want1 + t2 + want2 + t3, max_new_tokens=8)
    want3 = {o.req_id: o for o in ample.run()}[a3].tokens
    assert (got1, got2, got3) == (want1, want2, want3)


def test_stream_session_reclaim_reprefills_streamed():
    """A reclaimed stream session re-prefills through the streamed path
    (its history exceeds the pooled capacity) and still matches."""
    t1, t2 = turn_tokens(14, 40), turn_tokens(15, 6)
    eng = stream_engine()
    sid = eng.add_request(t1, max_new_tokens=6, session=True)
    got1 = {o.req_id: o for o in eng.run()}[sid].tokens
    free_before = eng.kvc.directory.host_free
    assert eng._reclaim_idle_session()
    sess = eng.get_session(sid)
    assert not sess.live and sess.stream_bids is None
    assert eng.kvc.directory.host_free > free_before
    rid2 = eng.continue_session(sid, t2, max_new_tokens=6)
    got2 = {o.req_id: o for o in eng.run()}[rid2].tokens
    assert sess.reprefills == 1 and sess.live and sess.stream_bids

    ample = make_engine()
    a2 = ample.add_request(t1 + got1 + t2, max_new_tokens=6)
    want2 = {o.req_id: o for o in ample.run()}[a2].tokens
    assert got2 == want2


def test_stream_session_end_frees_and_cancel():
    eng = stream_engine(host=64)
    sid = eng.add_request(turn_tokens(16, 40), max_new_tokens=4, session=True)
    eng.run()
    sess = eng.get_session(sid)
    held = len(sess.stream_bids)
    assert held > 0 and eng.kvc.directory.host_free == 64 - held
    # cancel of a QUEUED continuation leaves the session KV intact
    rid = eng.continue_session(sid, [5, 6], max_new_tokens=4)
    out = eng.cancel(rid)
    assert out.finish_reason == "cancelled" and sess.live and not sess.busy
    assert len(sess.stream_bids) == held
    eng.end_session(sid)
    assert eng.kvc.directory.host_free == 64
    try:
        eng.continue_session(sid, [1, 2])
        assert False, "continue after end_session should fail"
    except (ValueError, KeyError):
        pass


def test_end_session_frees():
    eng = make_engine()
    sid = eng.add_request(turn_tokens(9, 10), max_new_tokens=4, session=True)
    eng.run()
    held = eng._idle_session_blocks()
    assert held > 0
    eng.end_session(sid)
    assert eng._idle_session_blocks() == 0
    try:
        eng.continue_session(sid, [1, 2])
        assert False, "continue after end_session should fail"
    except ValueError:
        pass
