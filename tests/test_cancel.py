"""Request cancellation + ignore_eos tests.

Cancellation must free KV exactly like a normal finish (pool/host blocks
recovered, sessions keep theirs), withdraw queued entries, and leave the
other lanes' outputs untouched (greedy decoding is per-lane deterministic
regardless of batch composition)."""

import json
import socket
import time

import jax
import numpy as np

from cxl_speckv_tpu.config import (
    CacheConfig,
    EngineConfig,
    KVDtype,
    PrefetchConfig,
    SystemConfig,
)
from cxl_speckv_tpu.engine.engine import Engine
from cxl_speckv_tpu.engine.request import RequestState
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import init_params

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))


def make_engine(hbm_blocks=256, host_blocks=256, max_seq_len=128, seed=0):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm_blocks,
                          num_host_blocks=host_blocks, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=max_seq_len,
                            prefill_chunk=32),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False,
                  seed=seed)


def prompt(seed=0, n=12):
    rng = np.random.RandomState(seed)
    return rng.randint(1, CFG.vocab_size, n).tolist()


def test_cancel_queued_request():
    eng = make_engine()
    rid = eng.add_request(prompt(), max_new_tokens=8)
    out = eng.cancel(rid)
    assert out is not None and out.finish_reason == "cancelled"
    assert out.tokens == []
    assert not eng.has_work
    # double-cancel and unknown ids are clean no-ops
    assert eng.cancel(rid) is None
    assert eng.cancel(12345) is None


def test_cancel_running_request_frees_kv_and_leaves_others_intact():
    solo = make_engine()
    sid = solo.add_request(prompt(1), max_new_tokens=12)
    want = {o.req_id: o for o in solo.run()}[sid].tokens

    eng = make_engine()
    keep = eng.add_request(prompt(1), max_new_tokens=12)
    victim = eng.add_request(prompt(2), max_new_tokens=12)
    for _ in range(4):
        eng.step()
    vr = eng._requests[victim]
    assert vr.state in (RequestState.RUNNING, RequestState.PREFILLING)

    def live_blocks():
        return sum(len(eng.kvc.pool.seq(s).live_blocks)
                   for s in eng.kvc.pool.live_seqs())

    before = live_blocks()
    out = eng.cancel(victim)
    assert out.finish_reason == "cancelled"
    assert live_blocks() < before  # victim's blocks recovered
    outs = {o.req_id: o for o in eng.run()}
    assert victim not in outs
    assert outs[keep].tokens == want


def test_cancel_streamed_request_frees_host_blocks():
    # small HBM pool forces the long request onto the host-streamed path
    eng = make_engine(hbm_blocks=8, host_blocks=64, max_seq_len=64)
    rid = eng.add_request(prompt(0, n=70), max_new_tokens=8)
    free0 = eng.kvc.directory.host_free
    for _ in range(2):
        eng.step()
    assert rid in eng._streams
    assert eng.kvc.directory.host_free < free0
    out = eng.cancel(rid)
    assert out.finish_reason == "cancelled"
    assert eng.kvc.directory.host_free == free0
    assert rid not in eng._streams and not eng.has_work


def test_cancelled_session_turn_keeps_kv():
    eng = make_engine()
    rid = eng.add_request(prompt(3), max_new_tokens=10, session=True)
    for _ in range(6):
        eng.step()
    req = eng._requests[rid]
    assert req.state == RequestState.RUNNING and len(req.output) >= 1
    got = len(req.output)
    out = eng.cancel(rid)
    assert out.finish_reason == "cancelled" and len(out.tokens) == got
    # the session holds the partial turn and can continue from it
    cid = eng.continue_session(out.session_id, [5, 9], max_new_tokens=4)
    cont = {o.req_id: o for o in eng.run()}[cid].tokens

    fresh = make_engine()
    fid = fresh.add_request(prompt(3) + out.tokens + [5, 9], max_new_tokens=4)
    want = {o.req_id: o for o in fresh.run()}[fid].tokens
    assert cont == want


def test_cancel_session_mid_prefill_does_not_persist_partial_kv():
    """A session turn cancelled DURING prefill must not leave a live
    session whose stored tokens exceed the written KV — the next turn
    re-prefills the stored history instead."""
    eng = make_engine()
    p1 = prompt(6, n=10)
    rid = eng.add_request(p1, max_new_tokens=6, session=True)
    out1 = {o.req_id: o for o in eng.run()}[rid]
    sid = out1.session_id

    # second turn with a long continuation; cancel it mid-prefill
    follow = prompt(7, n=60)
    cid = eng.continue_session(sid, follow, max_new_tokens=6)
    eng.step()  # admit + first prefill chunk (32 < 60 tokens)
    req = eng._requests[cid]
    assert req.state == RequestState.PREFILLING
    out = eng.cancel(cid)
    assert out.finish_reason == "cancelled"
    sess = eng._sessions[sid]
    assert not sess.busy and not sess.live  # KV freed, history retained

    # the next turn re-prefills the stored history and matches a fresh
    # full-history request exactly
    c2 = eng.continue_session(sid, [3, 5], max_new_tokens=5)
    cont = {o.req_id: o for o in eng.run()}[c2].tokens
    fresh = make_engine()
    fid = fresh.add_request(p1 + out1.tokens + [3, 5], max_new_tokens=5)
    want = {o.req_id: o for o in fresh.run()}[fid].tokens
    assert cont == want
    assert sess.reprefills >= 1


def test_ignore_eos_runs_to_length():
    eng = make_engine()
    rid = eng.add_request(prompt(4), max_new_tokens=12)
    ref = {o.req_id: o for o in eng.run()}[rid].tokens
    assert len(ref) == 12
    fake_eos = ref[3]

    eng2 = make_engine()
    r2 = eng2.add_request(prompt(4), max_new_tokens=12, eos_token_id=fake_eos)
    out2 = {o.req_id: o for o in eng2.run()}[r2]
    assert out2.finish_reason == "eos"
    assert out2.tokens == ref[: ref.index(fake_eos) + 1]

    eng3 = make_engine()
    r3 = eng3.add_request(prompt(4), max_new_tokens=12, eos_token_id=fake_eos,
                          ignore_eos=True)
    out3 = {o.req_id: o for o in eng3.run()}[r3]
    assert out3.finish_reason == "length"
    assert out3.tokens == ref


def test_server_disconnect_cancels_stream():
    from cxl_speckv_tpu.server import SpeckvServer

    eng = make_engine()
    # slow the engine down so the disconnect reliably lands mid-generation
    # (the tiny model otherwise finishes before the RST propagates)
    orig_step = eng.step

    def slow_step():
        time.sleep(0.05)
        return orig_step()

    eng.step = slow_step
    with SpeckvServer(eng, port=0) as srv:
        body = json.dumps({"prompt": prompt(), "max_tokens": 100,
                           "ignore_eos": True, "stream": True}).encode()
        sock = socket.create_connection(("127.0.0.1", srv.port), timeout=60)
        sock.sendall(b"POST /v1/completions HTTP/1.1\r\n"
                     b"Host: x\r\nContent-Type: application/json\r\n"
                     b"Content-Length: " + str(len(body)).encode()
                     + b"\r\n\r\n" + body)
        # wait for the stream to actually start (headers + a chunk arrive)
        assert b"200" in sock.recv(4096)
        sock.close()  # vanish mid-stream
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            req = eng._requests.get(0)
            if req is not None and req.finish_reason == "cancelled":
                break
            time.sleep(0.05)
        assert eng._requests[0].finish_reason == "cancelled"
