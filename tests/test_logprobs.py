"""Per-token logprobs (OpenAI semantics: log_softmax of the raw model
logits, before temperature/top-p transforms) through prefill, single-token
decode, and fused multi-token decode — validated against forward_dense."""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cxl_speckv_tpu.config import (
    CacheConfig,
    EngineConfig,
    KVDtype,
    PrefetchConfig,
    SystemConfig,
)
from cxl_speckv_tpu.engine.engine import Engine
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import forward_dense, init_params

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))


def make_engine(horizon=1, kv=KVDtype.BF16, seed=0):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=256,
                          num_host_blocks=256, kv_dtype=kv),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=128,
                            prefill_chunk=32, decode_horizon=horizon),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False,
                  seed=seed)


def prompt(seed=0, n=10):
    rng = np.random.RandomState(seed)
    return rng.randint(1, CFG.vocab_size, n).tolist()


def dense_logprob(tokens_all, pos):
    """log_softmax of the dense forward's logits at `pos` (predicting
    tokens_all[pos+1])."""
    logits = forward_dense(PARAMS, CFG, jnp.asarray([tokens_all]))
    return np.asarray(jax.nn.log_softmax(logits[0, pos].astype(jnp.float32)))


def run_one(eng, p, **kw):
    rid = eng.add_request(p, **kw)
    return {o.req_id: o for o in eng.run()}[rid]


@pytest.mark.parametrize("horizon", [1, 4])
def test_greedy_logprobs_match_dense(horizon):
    p = prompt()
    out = run_one(make_engine(horizon=horizon), p, max_new_tokens=6,
                  logprobs=3)
    assert out.logprobs is not None and len(out.logprobs) == len(out.tokens)
    full = p + out.tokens
    for j, (tok, e) in enumerate(zip(out.tokens, out.logprobs)):
        assert len(e["top_ids"]) == 3 and len(e["top_logprobs"]) == 3
        # greedy picks the argmax, so the chosen token IS top-1
        assert e["top_ids"][0] == tok
        assert e["top_logprobs"][0] == pytest.approx(e["logprob"], abs=1e-6)
        # top logprobs sorted descending
        assert e["top_logprobs"] == sorted(e["top_logprobs"], reverse=True)
        # raw-distribution value matches the dense forward (bf16 KV is the
        # near-lossless pool encoding; decode-path numerics differ slightly)
        dl = dense_logprob(full, len(p) + j - 1)
        assert e["logprob"] == pytest.approx(float(dl[tok]), abs=2e-2)


def test_logprob_entries_align_with_stop_trim():
    p = prompt(1)
    ref = run_one(make_engine(), p, max_new_tokens=10)
    seq = ref.tokens[3:5]
    out = run_one(make_engine(), p, max_new_tokens=10, logprobs=2,
                  stop_sequences=[seq])
    assert out.finish_reason == "stop"
    assert len(out.logprobs) == len(out.tokens)


def test_sampled_logprobs_are_raw_distribution():
    """With temperature, the chosen token need not be top-1, but its raw
    logprob must still match the dense distribution."""
    p = prompt(2)
    out = run_one(make_engine(horizon=4, seed=3), p, max_new_tokens=6,
                  temperature=0.9, logprobs=2)
    full = p + out.tokens
    for j, (tok, e) in enumerate(zip(out.tokens, out.logprobs)):
        dl = dense_logprob(full, len(p) + j - 1)
        assert e["logprob"] == pytest.approx(float(dl[tok]), abs=2e-2)


def test_mixed_batch_logprob_and_plain_lanes():
    """A scoring lane batched with plain lanes: the group runs with the
    max requested k, plain lanes return None, and outputs are identical
    to an all-plain engine (the flag changes returns, not math)."""
    eng = make_engine(horizon=4)
    ps = [prompt(11, n=40), prompt(12, n=9), prompt(13, n=9)]
    r0 = eng.add_request(ps[0], max_new_tokens=5, logprobs=2,
                         prompt_logprobs=True)
    r1 = eng.add_request(ps[1], max_new_tokens=5)
    r2 = eng.add_request(ps[2], max_new_tokens=5, logprobs=4)
    outs = {o.req_id: o for o in eng.run()}
    assert outs[r1].logprobs is None and outs[r1].prompt_logprobs is None
    assert len(outs[r0].logprobs) == 5
    assert all(len(e["top_ids"]) == 2 for e in outs[r0].logprobs)
    assert all(len(e["top_ids"]) == 4 for e in outs[r2].logprobs)
    assert len(outs[r0].prompt_logprobs) == len(ps[0])

    plain = make_engine(horizon=4)
    want = {plain.add_request(p, max_new_tokens=5): p for p in ps}
    wouts = {o.req_id: o for o in plain.run()}
    assert [outs[r].tokens for r in (r0, r1, r2)] == \
        [wouts[r].tokens for r in sorted(wouts)]


def test_logprobs_validation():
    eng = make_engine()
    with pytest.raises(ValueError):
        eng.add_request(prompt(), logprobs=21)


def test_spec_engine_logprobs_match_plain():
    """Speculative engines return per-token logprobs (VERDICT r2 item 6):
    verify logits row j IS the raw target distribution for emitted token j,
    so a greedy ngram-spec run's logprob records match the plain engine's
    for the identical token stream."""
    p = prompt(4)
    plain = run_one(make_engine(), p, max_new_tokens=8, logprobs=3)
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=256,
                          num_host_blocks=256, kv_dtype=KVDtype.BF16),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=128,
                            prefill_chunk=32),
    )
    spec_eng = Engine(CFG, sc, params=PARAMS, use_pallas=False,
                      enable_lstm=False, spec_ngram=True)
    out = run_one(spec_eng, p, max_new_tokens=8, logprobs=3)
    assert out.tokens == plain.tokens
    assert len(out.logprobs) == len(out.tokens)
    for a, b in zip(out.logprobs, plain.logprobs):
        assert a["top_ids"] == b["top_ids"]
        # decode-path vs verify-path numerics differ at the usual 1e-2 band
        assert a["logprob"] == pytest.approx(b["logprob"], abs=2e-2)
        # chosen token is top-1 on greedy lanes through the verify path too
        assert a["top_ids"][0] == b["top_ids"][0]


def test_fused_rounds_engine_logprobs():
    """fused_rounds engines (migration batch + model step in one dispatch)
    return logprobs; values match the split-pipeline engine's records."""
    def engine(fused):
        sc = SystemConfig(
            cache=CacheConfig(block_size=8, num_hbm_blocks=10,
                              num_host_blocks=64, kv_dtype=KVDtype.INT8),
            prefetch=PrefetchConfig(enabled=True, depth=2),
            engine=EngineConfig(max_batch_size=4, max_seq_len=96,
                                prefill_chunk=32, decode_horizon=2,
                                fused_rounds=fused),
        )
        return Engine(CFG, sc, params=PARAMS, use_pallas=False,
                      enable_lstm=False)

    ps = [prompt(i, n=12) for i in range(5, 9)]

    def serve(eng):
        ids = [eng.add_request(p, max_new_tokens=6, logprobs=2) for p in ps]
        outs = {o.req_id: o for o in eng.run()}
        return [outs[i] for i in ids]

    ref = serve(engine(False))
    fused_eng = engine(True)
    assert fused_eng._fused_rounds
    got = serve(fused_eng)
    for a, b in zip(got, ref):
        assert a.tokens == b.tokens
        assert len(a.logprobs) == len(a.tokens)
        for ea, eb in zip(a.logprobs, b.logprobs):
            assert ea["top_ids"] == eb["top_ids"]
            assert ea["logprob"] == pytest.approx(eb["logprob"], abs=1e-4)


def test_prompt_logprobs_match_dense_across_chunks():
    """Echo scoring: prefill_chunk=32 over a 50-token prompt forces the
    boundary-refeed path; every prompt token i >= 1 must score
    log p(prompt[i] | prompt[:i]) per forward_dense."""
    p = prompt(5, n=50)
    out = run_one(make_engine(), p, max_new_tokens=2, prompt_logprobs=True)
    pl = out.prompt_logprobs
    assert pl is not None and len(pl) == len(p) and pl[0] is None
    logits = forward_dense(PARAMS, CFG, jnp.asarray([p]))
    lp = np.asarray(jax.nn.log_softmax(logits[0].astype(jnp.float32), -1))
    for i in range(1, len(p)):
        assert pl[i] == pytest.approx(float(lp[i - 1, p[i]]), abs=2e-2), i


def test_prompt_logprobs_single_chunk_and_prefix_cache():
    """Short prompt (one chunk) works, and a prompt already in the prefix
    cache still gets scored (the claim is skipped for scoring requests)
    with identical generated tokens."""
    p = prompt(6, n=9)
    eng = make_engine()
    first = run_one(eng, p, max_new_tokens=4)          # populates the cache
    out = run_one(eng, p, max_new_tokens=4, prompt_logprobs=True)
    assert out.tokens == first.tokens
    assert len(out.prompt_logprobs) == len(p)
    assert all(x is not None for x in out.prompt_logprobs[1:])


def test_prompt_logprobs_survive_preemption():
    """A preempted scoring request restarts prefill from 0 — partial
    scores must clear so re-admission doesn't duplicate entries."""
    eng = make_engine()
    p = prompt(9, n=50)
    rid = eng.add_request(p, max_new_tokens=2, prompt_logprobs=True)
    eng.step()  # first prefill chunk collects partial scores
    req = eng._requests[rid]
    assert len(req.prompt_logprobs_data) > 0
    assert eng.scheduler.preempt_youngest() is req
    assert req.prompt_logprobs_data == []
    out = {o.req_id: o for o in eng.run()}[rid]
    pl = out.prompt_logprobs
    assert len(pl) == len(p)
    logits = forward_dense(PARAMS, CFG, jnp.asarray([p]))
    lp = np.asarray(jax.nn.log_softmax(logits[0].astype(jnp.float32), -1))
    for i in (1, 25, len(p) - 1):
        assert pl[i] == pytest.approx(float(lp[i - 1, p[i]]), abs=2e-2)


def test_prompt_logprobs_validation():
    # r4 lifted the blanket session rejection (first turns prefill fully —
    # see test_prompt_logprobs_on_session_first_turn); what remains is the
    # structural requirement: chunks must be >= 2 for the boundary re-feed
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=256,
                          num_host_blocks=256, kv_dtype=KVDtype.BF16),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=4, max_seq_len=128,
                            prefill_chunk=1),
    )
    eng = Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)
    with pytest.raises(ValueError, match="prefill_chunk"):
        eng.add_request(prompt(), prompt_logprobs=True)


def test_server_returns_prompt_logprobs():
    from cxl_speckv_tpu.server import SpeckvServer

    p = prompt(8, n=12)
    eng = make_engine()
    with SpeckvServer(eng, port=0) as srv:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps({"prompt": p, "max_tokens": 3,
                             "prompt_logprobs": True}).encode(),
            headers={"Content-Type": "application/json"})
        body = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert len(body["prompt_logprobs"]) == len(p)
        assert body["prompt_logprobs"][0] is None


def test_server_returns_logprobs():
    from cxl_speckv_tpu.server import SpeckvServer

    eng = make_engine()
    with SpeckvServer(eng, port=0) as srv:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/completions",
            data=json.dumps({"prompt": prompt(), "max_tokens": 5,
                             "logprobs": 2}).encode(),
            headers={"Content-Type": "application/json"})
        body = json.loads(urllib.request.urlopen(req, timeout=120).read())
        lp = body["logprobs"]
        n = len(body["tokens"])
        assert len(lp["token_logprobs"]) == n
        assert all(len(t) == 2 for t in lp["top_ids"])
        assert all(len(t) == 2 for t in lp["top_logprobs"])


def test_prompt_logprobs_on_streamed_path():
    """r4 (VERDICT r3 next-step #9): the host-streamed path scores prompt
    tokens inside each streamed prefill chunk with the same boundary
    re-feed as the pooled path — every token i >= 1 matches forward_dense
    within KV-quantization tolerance, across chunk boundaries."""
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=6,
                          num_host_blocks=64, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=48,
                            prefill_chunk=16),
    )
    eng = Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)
    p = prompt(21, n=50)  # > max_seq_len -> streamed; 4 chunks
    rid = eng.add_request(p, max_new_tokens=3, prompt_logprobs=True,
                          logprobs=2)
    assert len(eng._stream_queue) == 1  # really on the streamed path
    out = {o.req_id: o for o in eng.run()}[rid]
    pl = out.prompt_logprobs
    assert pl is not None and len(pl) == len(p) and pl[0] is None
    logits = forward_dense(PARAMS, CFG, jnp.asarray([p]))
    lp = np.asarray(jax.nn.log_softmax(logits[0].astype(jnp.float32), -1))
    for i in range(1, len(p)):
        assert pl[i] == pytest.approx(float(lp[i - 1, p[i]]), abs=2e-2), i
    # per-token logprobs still ride the streamed path alongside
    assert out.logprobs is not None and len(out.logprobs) == len(out.tokens)


def test_streamed_prompt_logprobs_tokens_unchanged():
    """The boundary re-feed rewrites byte-identical KV: a streamed scoring
    request generates the same greedy tokens as the same request without
    scoring."""
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=6,
                          num_host_blocks=64, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=48,
                            prefill_chunk=16),
    )
    p = prompt(22, n=44)
    eng = Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)
    plain = run_one(eng, p, max_new_tokens=6)
    eng2 = Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)
    scored = run_one(eng2, p, max_new_tokens=6, prompt_logprobs=True)
    assert plain.tokens == scored.tokens


def test_prompt_logprobs_on_session_first_turn():
    """r4: the FIRST turn of a session prefills its whole prompt, so
    prompt_logprobs is available there (the old blanket session rejection
    only belongs on restored turns — continue_session has no
    prompt_logprobs parameter). Scores match a non-session request, and
    the session continues normally afterwards."""
    p = prompt(31, n=12)
    plain = run_one(make_engine(), p, max_new_tokens=4, prompt_logprobs=True)
    eng = make_engine()
    rid = eng.add_request(p, max_new_tokens=4, prompt_logprobs=True,
                          session=True)
    out = {o.req_id: o for o in eng.run()}[rid]
    assert out.session_id is not None
    assert out.prompt_logprobs == plain.prompt_logprobs
    assert out.tokens == plain.tokens
    # the session keeps working: next turn continues from live KV
    r2 = eng.continue_session(out.session_id, [5, 6, 7], max_new_tokens=3)
    out2 = {o.req_id: o for o in eng.run()}[r2]
    assert len(out2.tokens) == 3
    assert out2.prompt_logprobs is None  # restored turns don't score


def test_prompt_logprobs_on_streamed_session_first_turn():
    """Session + over-capacity prompt: the first turn runs host-streamed
    AND scores its prompt (both r4 lifts composed)."""
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=6,
                          num_host_blocks=64, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=48,
                            prefill_chunk=16),
    )
    eng = Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)
    p = prompt(33, n=50)  # > max_seq_len -> streamed
    rid = eng.add_request(p, max_new_tokens=3, prompt_logprobs=True,
                          session=True)
    assert len(eng._stream_queue) == 1
    out = {o.req_id: o for o in eng.run()}[rid]
    pl = out.prompt_logprobs
    assert pl is not None and len(pl) == len(p) and pl[0] is None
    logits = forward_dense(PARAMS, CFG, jnp.asarray([p]))
    lp = np.asarray(jax.nn.log_softmax(logits[0].astype(jnp.float32), -1))
    for i in range(1, len(p)):
        assert pl[i] == pytest.approx(float(lp[i - 1, p[i]]), abs=2e-2), i
    # streamed session stays continuable
    r2 = eng.continue_session(out.session_id, [9, 8], max_new_tokens=2)
    out2 = {o.req_id: o for o in eng.run()}[r2]
    assert len(out2.tokens) == 2
