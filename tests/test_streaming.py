"""Host-streamed serving: sequences whose KV exceeds the HBM pool.

The capability gap VERDICT r1 ranked #1 (reference premise: serve KV far
larger than fast memory, `README.md:16-19`; 32K-128K adaptation
`docs/ARCHITECTURE.md:271`). A streamed sequence's KV lives entirely in the
host tier; attention streams it wave-by-wave and appends back to the store.

Decisive invariant: a streamed request generates the SAME greedy tokens as
the same request served by an ample-HBM engine (the attention math is
identical up to f32 summation order).
"""

import jax
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
from cxl_speckv_tpu.models.llama import init_params

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))


def make_engine(hbm=6, host=64, max_seq=64, max_stream=None, bs=8,
                prefill_chunk=16):
    sc = SystemConfig(
        cache=CacheConfig(block_size=bs, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=max_seq,
                            prefill_chunk=prefill_chunk,
                            max_stream_seq_len=max_stream),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)


def prompt_of(n, seed=0):
    return np.random.RandomState(seed).randint(
        1, CFG.vocab_size, n).tolist()


def test_stream_routing():
    eng = make_engine(hbm=6, max_seq=64)
    # fits HBM (6-2=4 blocks = 32 tokens): normal path
    rid = eng.add_request(prompt_of(10), max_new_tokens=8)
    assert not eng._stream_queue
    # exceeds the HBM budget: streamed path
    rid2 = eng.add_request(prompt_of(40), max_new_tokens=12)
    assert len(eng._stream_queue) == 1
    outs = eng.run()
    assert {o.req_id for o in outs} == {rid, rid2}
    assert all(o.finish_reason in ("length", "eos") for o in outs)


def test_stream_matches_ample_hbm_greedy():
    """A sequence larger than the HBM pool must decode token-identically
    to the same request on an engine where everything fits."""
    prompt = prompt_of(40, seed=3)
    gen = 12

    eng_s = make_engine(hbm=6, host=64, max_seq=64)
    rid = eng_s.add_request(prompt, max_new_tokens=gen)
    assert rid in {r.req_id for r in eng_s._stream_queue}
    outs_s = eng_s.run()
    assert len(outs_s) == 1 and len(outs_s[0].tokens) == gen
    st = eng_s.get_statistics()
    assert st["engine"]["stream_chunks"] >= 3   # 40 tokens / 16-chunk
    assert st["engine"]["stream_tokens"] >= gen - 1

    eng_a = make_engine(hbm=64, host=64, max_seq=64)
    eng_a.add_request(prompt, max_new_tokens=gen)
    outs_a = eng_a.run()
    assert outs_s[0].tokens == outs_a[0].tokens


def test_stream_eos_and_temperature_paths():
    eng = make_engine(hbm=6, host=64, max_seq=64)
    # temperature sampling on the streamed path must run and finish
    rid = eng.add_request(prompt_of(40, seed=5), max_new_tokens=6,
                          temperature=0.8)
    outs = eng.run()
    assert len(outs) == 1 and len(outs[0].tokens) == 6


def test_stream_staged_paths_match():
    """The r4 staged-gather path (one host op per layer group) must be
    token-identical to the legacy per-(layer, wave) fetch path and to the
    ample-HBM pooled engine — including when the staging budget forces
    MULTIPLE layer groups (stage_mb=1 at a 1024-block wave makes
    G=1 < num_layers for the tiny config's 640 B block rows)."""
    prompt = prompt_of(40, seed=7)
    gen = 8
    results = {}
    for label, stage_mb, wave in (("legacy", 0, 16), ("staged", 256, 16),
                                  ("staged-grouped", 1, 1024)):
        sc = SystemConfig(
            cache=CacheConfig(block_size=8, num_hbm_blocks=6,
                              num_host_blocks=1100, kv_dtype=KVDtype.INT8),
            prefetch=PrefetchConfig(enabled=False),
            engine=EngineConfig(max_batch_size=2, max_seq_len=64,
                                prefill_chunk=16, max_stream_seq_len=8192,
                                stream_wave=wave, stream_stage_mb=stage_mb),
        )
        eng = Engine(CFG, sc, params=PARAMS, use_pallas=False,
                     enable_lstm=False)
        eng.add_request(prompt, max_new_tokens=gen)
        outs = eng.run()
        assert len(outs) == 1 and len(outs[0].tokens) == gen
        results[label] = outs[0].tokens
    eng_a = make_engine(hbm=64, host=64, max_seq=64)
    eng_a.add_request(prompt, max_new_tokens=gen)
    results["ample"] = eng_a.run()[0].tokens
    ref = results["ample"]
    assert all(t == ref for t in results.values()), results


def test_stream_mixed_with_normal_traffic():
    """Streamed and pooled requests interleave in the same engine run."""
    eng = make_engine(hbm=8, host=64, max_seq=64)
    normal = [eng.add_request(prompt_of(10, seed=i), max_new_tokens=8)
              for i in range(3)]
    big = eng.add_request(prompt_of(48, seed=9), max_new_tokens=10)
    outs = {o.req_id: o for o in eng.run()}
    assert set(outs) == set(normal) | {big}
    assert len(outs[big].tokens) == 10
    # streamed blocks were freed at finish
    assert eng.kvc.directory.host_free == 64


def test_concurrent_streams_batched_one_dispatch():
    """Multiple streamed lanes ride ONE batched dispatch per phase group
    (stream_step_batched) and each decodes token-identically to serving
    it alone."""
    prompts = [prompt_of(40, seed=20 + i) for i in range(3)]
    gen = 8

    solo = []
    for p in prompts:
        e = make_engine(hbm=6, host=64, max_seq=64)
        e.add_request(p, max_new_tokens=gen)
        solo.append(e.run()[0].tokens)

    eng = make_engine(hbm=6, host=256, max_seq=64)
    rids = [eng.add_request(p, max_new_tokens=gen) for p in prompts]
    assert len(eng._stream_queue) == 3
    toks = {o.req_id: o.tokens for o in eng.run()}
    for rid, want in zip(rids, solo):
        assert toks[rid] == want
    # batched: 3 lanes advanced per engine step, so steady-state decode
    # took ~gen steps, not 3*gen
    st = eng.get_statistics()
    assert st["engine"]["stream_tokens"] >= 3 * (gen - 1)


def test_stream_logprobs():
    """logprobs on the host-streamed path (lifted in r3): chosen-token
    logprob must equal the top-1 logprob for greedy lanes, with one entry
    per generated token."""
    eng = make_engine(hbm=6, host=64, max_seq=64)
    rid = eng.add_request(prompt_of(40, seed=7), max_new_tokens=6,
                          logprobs=3)
    outs = eng.run()
    assert len(outs) == 1
    lps = outs[0].logprobs
    assert lps is not None and len(lps) == len(outs[0].tokens)
    for tok, entry in zip(outs[0].tokens, lps):
        assert entry["top_ids"][0] == tok          # greedy = argmax
        assert abs(entry["logprob"] - entry["top_logprobs"][0]) < 1e-5
        assert len(entry["top_ids"]) == 3
    # prompt_logprobs rides the streamed path too (lifted in r4 —
    # dense-validated in tests/test_logprobs.py)
    rid2 = eng.add_request(prompt_of(40, seed=8), max_new_tokens=4,
                           prompt_logprobs=True)
    outs2 = {o.req_id: o for o in eng.run()}
    assert len(outs2[rid2].prompt_logprobs) == 40


def test_stream_capacity_rejection():
    eng = make_engine(hbm=6, host=16, max_seq=64)
    with pytest.raises(ValueError, match="host-streamed capacity"):
        eng.add_request(prompt_of(200), max_new_tokens=100)


def test_128k_shaped_config():
    """BASELINE config 3 shape: a 128k-token-capable stream table (the
    fori_loop makes unused table waves free), exercised with a real
    sequence beyond the HBM pool."""
    bs = 8
    eng = make_engine(hbm=4, host=2052, max_seq=32,
                      max_stream=131072, bs=bs)
    assert eng._stream_max_blocks * bs >= 16384  # host-capacity bounded
    prompt = prompt_of(100, seed=11)
    rid = eng.add_request(prompt, max_new_tokens=8)
    outs = eng.run()
    assert len(outs) == 1 and len(outs[0].tokens) == 8

    # same tokens as ample serving
    eng_a = make_engine(hbm=32, host=32, max_seq=128, bs=bs)
    eng_a.add_request(prompt, max_new_tokens=8)
    outs_a = eng_a.run()
    assert outs[0].tokens == outs_a[0].tokens


def _horizon_engine(h, stage_mb=256, logprobs_ok=True):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=6,
                          num_host_blocks=64, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=64,
                            prefill_chunk=16, decode_horizon=h,
                            stream_stage_mb=stage_mb),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)


def test_stream_fused_decode_matches_per_token():
    """r4 fused streamed decode (stream_decode_multi_batched): horizon
    steps against a once-staged context slab whose in-graph writes
    reproduce exactly the bytes separate dispatches would re-fetch —
    greedy tokens must be IDENTICAL to the per-token path, including
    across block boundaries and for multiple concurrent lanes."""
    ps = [prompt_of(90, seed=3), prompt_of(75, seed=4)]

    def run(h, gen=21):
        eng = _horizon_engine(h)
        ids = [eng.add_request(p, max_new_tokens=gen) for p in ps]
        assert len(eng._stream_queue) == 2
        outs = {o.req_id: o for o in eng.run()}
        return [outs[i].tokens for i in ids]

    base = run(1)       # per-token dispatches
    # 21 % 4 != 0: the final round overshoots, exercising valid masking
    assert run(4) == base


def test_stream_fused_decode_logprobs_and_stops():
    p = prompt_of(90, seed=5)
    base_eng = _horizon_engine(1)
    rid = base_eng.add_request(p, max_new_tokens=12, logprobs=2)
    base = {o.req_id: o for o in base_eng.run()}[rid]
    eng = _horizon_engine(4)
    rid = eng.add_request(p, max_new_tokens=12, logprobs=2)
    out = {o.req_id: o for o in eng.run()}[rid]
    assert out.tokens == base.tokens
    assert len(out.logprobs) == len(out.tokens)
    for a, b in zip(out.logprobs, base.logprobs):
        assert a["top_ids"] == b["top_ids"]
        assert abs(a["logprob"] - b["logprob"]) < 1e-5
    # stop token mid-horizon: emission truncates at the stop
    stop_tok = base.tokens[5]
    eng = _horizon_engine(4)
    rid = eng.add_request(p, max_new_tokens=12, stop_token_ids=[stop_tok])
    out = {o.req_id: o for o in eng.run()}[rid]
    assert out.finish_reason == "stop"
    assert out.tokens == base.tokens[:6]


def test_stream_fused_decode_budget_fallback():
    """When the all-layers slab exceeds the fused budget the dispatch
    falls back to the per-token path — same tokens either way."""
    base = None
    for stage in (256, 0):
        eng = _horizon_engine(4, stage_mb=stage)
        rid = eng.add_request(prompt_of(90, seed=6), max_new_tokens=10)
        toks = {o.req_id: o for o in eng.run()}[rid].tokens
        if base is None:
            base = toks
        else:
            assert toks == base


def test_stream_fused_session_continues():
    """A streamed session served with fused decode keeps the session
    identity invariant: continuation matches a fresh full-history run."""
    p = prompt_of(90, seed=7)
    eng = _horizon_engine(4)
    rid = eng.add_request(p, max_new_tokens=6, session=True)
    out = {o.req_id: o for o in eng.run()}[rid]
    sid = out.session_id
    r2 = eng.continue_session(sid, [11, 12, 13], max_new_tokens=6)
    out2 = {o.req_id: o for o in eng.run()}[r2]
    fresh = _horizon_engine(4)
    rf = fresh.add_request(p + out.tokens + [11, 12, 13], max_new_tokens=6)
    want = {o.req_id: o for o in fresh.run()}[rf].tokens
    assert out2.tokens == want
