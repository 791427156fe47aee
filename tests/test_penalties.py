"""Sampling penalties: OpenAI frequency/presence + HF/vLLM repetition.

The reference exposes no sampling layer (its serving side is vLLM); this is
an engine-parity surface (PARITY.md "Sampling penalties" row). The state
lives in a device-resident token-count plane updated in-graph
(`engine/sampling.py` module comment), so the fused multi-token decode path
pays no host round trip per step.

Decisive invariants:
- in-graph penalized greedy decode == a host-side step-by-step reference
  applying the documented formulas (model layer, bit-deterministic on CPU)
- unpenalized lanes in a penalty-active engine are TOKEN-IDENTICAL to an
  engine that never saw a penalty (guard-row isolation)
- multi-token horizons, fused tiered rounds, and row reuse after finish all
  preserve the single-step semantics
"""

from collections import Counter

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
from cxl_speckv_tpu.engine.sampling import (
    PEN_COUNT_MASK,
    PEN_PROMPT_BIT,
    apply_penalties,
    encode_pen_info,
    pen_mark_prompt,
    pen_reset_rows,
    penalize_and_count,
)
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import (
    decode_multi,
    decode_step,
    init_params,
    prefill_chunk,
)
from cxl_speckv_tpu.ops.quant import kv_storage_dtype

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))
V = CFG.vocab_size


# -- unit: the penalty math ---------------------------------------------------


def ref_penalize(logits, counts, prompt_seen, fp, pp, rp):
    """Host reference of `apply_penalties` for one lane. float32 arithmetic
    to mirror the in-graph math bit-for-bit (argmax ties must agree)."""
    lg = np.asarray(logits, np.float32).copy()
    out_seen = counts > 0
    lg = lg - (np.float32(fp) * counts.astype(np.float32)
               + np.float32(pp) * out_seen.astype(np.float32))
    if rp > 0:
        seen = out_seen | prompt_seen
        r = np.float32(max(rp, 1e-3))
        shrunk = np.where(lg > 0, lg / r, lg * r)
        lg = np.where(seen, shrunk, lg)
    return lg


def test_apply_penalties_matches_reference():
    rng = np.random.RandomState(0)
    B, vocab = 3, 32
    logits = rng.randn(B, vocab).astype(np.float32) * 3
    counts = rng.randint(0, 4, (B, vocab)).astype(np.int32)
    prompt = rng.rand(B, vocab) < 0.3
    rows = counts + prompt.astype(np.int32) * PEN_PROMPT_BIT
    fp = np.array([0.5, 0.0, -1.0], np.float32)
    pp = np.array([0.25, 2.0, 0.0], np.float32)
    rp = np.array([1.5, 0.0, 0.8], np.float32)
    got = np.asarray(apply_penalties(
        jnp.asarray(logits), jnp.asarray(rows), jnp.asarray(fp),
        jnp.asarray(pp), jnp.asarray(rp)))
    for b in range(B):
        want = ref_penalize(logits[b], counts[b], prompt[b],
                            fp[b], pp[b], rp[b])
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_zero_penalties_pass_through_bit_identical():
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 64).astype(np.float32)
    rows = rng.randint(0, 5, (2, 64)).astype(np.int32)
    z = jnp.zeros(2, jnp.float32)
    got = np.asarray(apply_penalties(jnp.asarray(logits), jnp.asarray(rows),
                                     z, z, z))
    assert (got == logits).all()


def test_penalize_and_count_gating_and_guard():
    """Count-flag gating: only lanes with flag bit 1 AND a real row
    accumulate; everything else lands in the (never-read) guard row."""
    vocab, rows = 16, 3
    pen_counts = jnp.zeros((rows + 1, vocab), jnp.int32)
    logits = jnp.zeros((3, vocab), jnp.float32).at[:, 5].set(10.0)
    pen_info = jnp.asarray([
        encode_pen_info(0, 1.0, 0.0, 0.0, count_sampled=True),
        encode_pen_info(1, 1.0, 0.0, 0.0, count_sampled=False),
        encode_pen_info(rows, 0.0, 0.0, 0.0, count_sampled=False),  # guard
    ], jnp.int32)
    toks, pc = penalize_and_count(
        logits, pen_info, pen_counts,
        lambda lg: jnp.argmax(lg, axis=-1))
    pc = np.asarray(pc)
    assert toks.tolist() == [5, 5, 5]
    assert pc[0, 5] == 1          # counted
    assert pc[1].sum() == 0       # count flag clear -> guard
    assert pc[2].sum() == 0       # untouched row


def test_reset_and_mark_prompt():
    vocab, rows = 16, 2
    pc = jnp.full((rows + 1, vocab), 7, jnp.int32)
    pen_info = jnp.asarray([
        encode_pen_info(0, 1.0, 0.0, 0.0, reset=True),
        encode_pen_info(1, 1.0, 0.0, 0.0, reset=False),
    ], jnp.int32)
    pc = pen_reset_rows(pen_info, pc)
    assert np.asarray(pc)[0].sum() == 0
    assert (np.asarray(pc)[1] == 7).all()
    token_ids = jnp.asarray([[3, 4, 4, 9], [5, 6, 7, 8]], jnp.int32)
    valid = jnp.asarray([3, 0], jnp.int32)  # lane 1 contributes nothing
    pc = pen_mark_prompt(pen_info, pc, token_ids, valid)
    pc = np.asarray(pc)
    for t in (3, 4):
        assert pc[0, t] & PEN_PROMPT_BIT
    assert not pc[0, 9] & PEN_PROMPT_BIT      # beyond valid
    assert not (pc[1] & PEN_PROMPT_BIT).any()  # valid = 0
    # marking is idempotent and preserves counts in the low bits
    assert (pc[1] & PEN_COUNT_MASK == 7).all()


# -- model layer: in-graph fused decode == host step-by-step reference --------


BS = 8
SLOTS = 32
MAXB = 8


def empty_pools(cfg, kv_dtype, slots=SLOTS, bs=BS):
    pack = 2 if kv_dtype == KVDtype.INT4 else 1
    kt = (cfg.num_layers, slots, cfg.head_dim // pack,
          cfg.num_kv_heads * bs)
    shape = (cfg.num_layers, slots, cfg.num_kv_heads, bs, cfg.head_dim // pack)
    kp = jnp.zeros(kt, kv_storage_dtype(kv_dtype))
    sc = jnp.ones((cfg.num_layers, slots, 1,
                   cfg.num_kv_heads * bs), jnp.float32)
    return kp, jnp.zeros(shape, kv_storage_dtype(kv_dtype)), sc, jnp.ones_like(sc)


@pytest.mark.parametrize("fp,pp,rp", [
    (1.0, 0.5, 0.0),
    (0.0, 0.0, 1.7),
    (-0.8, 0.3, 1.3),
])
def test_decode_multi_penalized_matches_host_reference(fp, pp, rp):
    kv_dtype = KVDtype.BF16
    prompt = np.array([3, 17, 9, 3, 1, 42], np.int32)
    horizon = 10
    # the in-graph path decodes fp/pp/rp from int32 milli/centi encodings in
    # f32 — mirror that exactly so argmax ties can't flip on 1e-8 noise
    fp = np.float32(np.float32(round(fp * 1000)) * np.float32(1e-3))
    pp = np.float32(np.float32(round(pp * 1000)) * np.float32(1e-3))
    rp_enc = round(rp * 100) if rp > 0 and abs(rp - 1.0) > 1e-9 else 0
    rp = np.float32(np.float32(rp_enc) * np.float32(1e-2))

    def prefilled():
        kp, vp, ks, vs = empty_pools(CFG, kv_dtype)
        table = jnp.arange(1, MAXB + 1, dtype=jnp.int32)[None, :]
        lg, kp, vp, ks, vs = prefill_chunk(
            PARAMS, CFG, kv_dtype, jnp.asarray(prompt), jnp.int32(0),
            kp, vp, ks, vs, table[0])
        return lg, (kp, vp, ks, vs), table

    # host reference: step decode_step, penalize in numpy, greedy argmax
    lg, pools, table = prefilled()
    counts = np.zeros(V, np.int64)
    prompt_seen = np.zeros(V, bool)
    prompt_seen[prompt] = True
    want = []
    logits = np.asarray(lg, np.float32)
    tok = int(ref_penalize(logits, counts, prompt_seen, fp, pp, rp).argmax())
    counts[tok] += 1
    want.append(tok)
    pos = len(prompt)
    for _ in range(horizon - 1):
        lg, *pools = decode_step(
            PARAMS, CFG, kv_dtype, jnp.asarray([tok], jnp.int32),
            jnp.asarray([pos], jnp.int32), *pools, table,
            jnp.asarray([pos + 1], jnp.int32))
        pools = tuple(pools)
        tok = int(ref_penalize(np.asarray(lg[0], np.float32), counts,
                               prompt_seen, fp, pp, rp).argmax())
        counts[tok] += 1
        want.append(tok)
        pos += 1

    # in-graph: ONE fused decode_multi with the penalty plane.
    # decode_multi samples AFTER feeding, so feed the first penalized token
    # (want[0]) and expect the remaining horizon-1 plus one extra.
    lg, pools, table = prefilled()
    pen_counts = jnp.zeros((2, V), jnp.int32)
    pen_info = jnp.asarray([encode_pen_info(0, fp, pp, rp)], jnp.int32)
    pen_counts = pen_mark_prompt(
        pen_info, pen_counts, jnp.asarray(prompt)[None], jnp.asarray([len(prompt)]))
    # seed the first sampled token's count exactly as the engine's prefill
    # program does (count_sampled on the prompt-completing chunk)
    pen_counts = pen_counts.at[0, want[0]].add(1)
    toks, *rest = decode_multi(
        PARAMS, CFG, kv_dtype, jnp.asarray([want[0]], jnp.int32),
        jnp.asarray([len(prompt)], jnp.int32), *pools, table,
        jnp.asarray([0, 0], jnp.uint32), jnp.zeros(1, jnp.float32),
        None, pen_info, pen_counts, horizon=horizon - 1)
    got = np.asarray(toks)[0].tolist()
    assert got == want[1:], f"in-graph {got} != host reference {want[1:]}"
    # the returned plane counted every sampled token
    pc = np.asarray(rest[-1])
    emitted = Counter(want)
    for t, c in emitted.items():
        assert pc[0, t] & PEN_COUNT_MASK == c


# -- engine integration --------------------------------------------------------


def make_engine(hbm_blocks=64, host_blocks=64, batch=4, horizon=1,
                fused=False, penalty_rows=16, **ekw):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm_blocks,
                          num_host_blocks=host_blocks, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=batch, max_seq_len=128,
                            prefill_chunk=32, decode_horizon=horizon,
                            fused_rounds=fused, penalty_rows=penalty_rows,
                            **ekw),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)


def prompts(n, seed=0, lo=6, hi=20):
    rng = np.random.RandomState(seed)
    return [rng.randint(1, V, rng.randint(lo, hi)).tolist() for _ in range(n)]


def run_one(eng, prompt, **kw):
    rid = eng.add_request(prompt, **kw)
    outs = {o.req_id: o for o in eng.run()}
    return outs[rid]


def test_penalized_request_completes_and_counts_exactly():
    eng = make_engine(horizon=1)
    p = prompts(1)[0]
    rid = eng.add_request(p, max_new_tokens=10, ignore_eos=True,
                          frequency_penalty=0.7, presence_penalty=0.2)
    req = eng._requests[rid]
    row = req.pen_row
    assert row >= 0
    outs = eng.run()
    assert len(outs[0].tokens) == 10
    # horizon=1 has no overshoot: the device plane's counts are EXACTLY the
    # emitted-token histogram (row content survives until reallocation)
    pc = np.asarray(eng._pen_counts)[row] & PEN_COUNT_MASK
    want = Counter(outs[0].tokens)
    for t in range(V):
        assert pc[t] == want.get(t, 0)
    # the row went back to the free list
    assert row in eng._pen_free


def test_unpenalized_lanes_identical_next_to_penalized():
    """Guard-row isolation: an engine serving a penalized request leaves
    co-batched unpenalized greedy lanes token-identical to an engine that
    never activated the plane."""
    ps = prompts(3, seed=3)
    eng_a = make_engine()
    ids_a = [eng_a.add_request(p, max_new_tokens=12) for p in ps]
    outs_a = {o.req_id: o.tokens for o in eng_a.run()}

    eng_b = make_engine()
    ids_b = [eng_b.add_request(p, max_new_tokens=12) for p in ps]
    eng_b.add_request(prompts(1, seed=9)[0], max_new_tokens=12,
                      frequency_penalty=1.5, presence_penalty=1.0,
                      repetition_penalty=1.4)
    outs_b = {o.req_id: o.tokens for o in eng_b.run()}
    for ra, rb in zip(ids_a, ids_b):
        assert outs_a[ra] == outs_b[rb]


def test_penalty_changes_generation():
    p = [5, 5, 5, 5, 5, 5, 5, 5]
    base = run_one(make_engine(), p, max_new_tokens=16, ignore_eos=True)
    pen = run_one(make_engine(), p, max_new_tokens=16, ignore_eos=True,
                  frequency_penalty=2.0, presence_penalty=2.0,
                  repetition_penalty=1.9)
    assert base.tokens != pen.tokens
    # heavy penalties break repetition: far more distinct tokens
    assert len(set(pen.tokens)) > len(set(base.tokens))


def test_horizon_matches_single_step():
    p = prompts(1, seed=5)[0]
    kw = dict(max_new_tokens=12, ignore_eos=True, frequency_penalty=1.0,
              presence_penalty=0.5, repetition_penalty=1.3)
    a = run_one(make_engine(horizon=1), p, **kw)
    b = run_one(make_engine(horizon=4), p, **kw)
    assert a.tokens == b.tokens


def test_tiered_oversubscription_matches_ample():
    """Penalties are orthogonal to tiering: tiny HBM pool (migrations every
    round) generates the same penalized greedy tokens as ample HBM."""
    p = prompts(1, seed=7, lo=30, hi=31)[0]
    kw = dict(max_new_tokens=16, ignore_eos=True, frequency_penalty=1.2,
              repetition_penalty=1.5)
    ample = run_one(make_engine(hbm_blocks=64), p, **kw)
    tight = run_one(make_engine(hbm_blocks=10), p, **kw)
    assert ample.tokens == tight.tokens


def test_fused_rounds_path():
    p = prompts(1, seed=11, lo=30, hi=31)[0]
    kw = dict(max_new_tokens=16, ignore_eos=True, frequency_penalty=1.2,
              presence_penalty=0.3)
    plain = run_one(make_engine(hbm_blocks=10), p, **kw)
    fused = run_one(make_engine(hbm_blocks=10, fused=True), p, **kw)
    assert plain.tokens == fused.tokens


def test_row_reuse_after_finish_resets():
    """A reused row's stale counts must not leak into the next request."""
    p2 = prompts(1, seed=13)[0]
    kw = dict(max_new_tokens=12, ignore_eos=True, frequency_penalty=1.1,
              repetition_penalty=1.6)
    alone = run_one(make_engine(), p2, **kw)
    eng = make_engine()
    run_one(eng, prompts(1, seed=12)[0], **kw)  # dirties the row
    reused = run_one(eng, p2, **kw)
    assert alone.tokens == reused.tokens


def test_prefix_cache_skipped_for_repetition_penalty():
    """Repetition penalty needs every prompt token marked, so the prefix
    cache must not skip its prefill — and the output must still match a
    fresh engine's."""
    p = prompts(1, seed=15, lo=30, hi=31)[0]
    kw = dict(max_new_tokens=10, ignore_eos=True, repetition_penalty=1.5)
    eng = make_engine()
    run_one(eng, p, max_new_tokens=4)  # populates the prefix cache
    warm = run_one(eng, p, **kw)
    fresh = run_one(make_engine(), p, **kw)
    assert warm.tokens == fresh.tokens


def test_session_turn_penalties():
    eng = make_engine()
    rid = eng.add_request(prompts(1, seed=17)[0], max_new_tokens=6,
                          session=True)
    out1 = eng.run()[0]
    rid2 = eng.continue_session(out1.session_id, [7, 8, 9],
                                max_new_tokens=8,
                                frequency_penalty=1.0,
                                repetition_penalty=1.2)
    outs = {o.req_id: o for o in eng.run()}
    assert len(outs[rid2].tokens) >= 1
    assert rid != rid2


def test_validation_and_rejections():
    eng = make_engine()
    p = prompts(1)[0]
    with pytest.raises(ValueError, match="frequency_penalty"):
        eng.add_request(p, frequency_penalty=3.0)
    with pytest.raises(ValueError, match="presence_penalty"):
        eng.add_request(p, presence_penalty=-2.5)
    with pytest.raises(ValueError, match="repetition_penalty"):
        eng.add_request(p, repetition_penalty=-1.0)
    # repetition_penalty=1.0 means OFF: no row consumed
    rid = eng.add_request(p, repetition_penalty=1.0, max_new_tokens=2)
    assert eng._requests[rid].pen_row < 0
    assert eng._pen_counts is None


def test_row_exhaustion():
    eng = make_engine(penalty_rows=1)
    p = prompts(2, seed=19)
    eng.add_request(p[0], frequency_penalty=1.0, max_new_tokens=4)
    with pytest.raises(ValueError, match="penalty_rows"):
        eng.add_request(p[1], frequency_penalty=1.0, max_new_tokens=4)
    eng.run()  # first finishes, row freed
    eng.add_request(p[1], frequency_penalty=1.0, max_new_tokens=4)
    eng.run()


def test_spec_engine_rejects_penalties():
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=64,
                          num_host_blocks=0, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=128,
                            prefill_chunk=32),
    )
    eng = Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False,
                 spec_ngram=True)
    with pytest.raises(ValueError, match="speculative"):
        eng.add_request(prompts(1)[0], frequency_penalty=1.0)


def make_stream_engine(horizon=1, **ekw):
    """Tight pooled capacity so long prompts route to the host-streamed
    path (device store backend, stream_enabled default)."""
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=6,
                          num_host_blocks=64, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=64,
                            prefill_chunk=16, decode_horizon=horizon,
                            stream_wave=4, **ekw),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)


PEN_KW = dict(frequency_penalty=1.0, presence_penalty=0.5,
              repetition_penalty=1.3)


def test_streamed_penalties_match_pooled_path():
    """r5 (VERDICT r4 #5): penalized greedy generation on the host-streamed
    path is token-identical to the pooled path (whose in-graph penalties
    match the host reference bit-for-bit) — the count plane rides the
    streamed chunk/decode programs exactly as it rides the pooled ones."""
    long_prompt = prompts(1, seed=21, lo=40, hi=41)[0]
    kw = dict(max_new_tokens=12, ignore_eos=True, **PEN_KW)
    pooled = run_one(make_engine(hbm_blocks=64), long_prompt, **kw)
    eng = make_stream_engine()
    st = run_one(eng, long_prompt, **kw)
    assert eng.get_statistics()["engine"]["stream_tokens"] > 0  # really streamed
    assert st.tokens == pooled.tokens
    # the request's pen row went back to the free list at finish
    assert len(eng._pen_free) == eng.config.engine.penalty_rows


def test_streamed_fused_horizon_matches_per_step():
    """The fused streamed decode (horizon steps per dispatch) applies
    penalties per fused step with overshoot counting masked — greedy
    tokens identical to horizon=1 per-step streamed dispatches."""
    long_prompt = prompts(1, seed=22, lo=40, hi=41)[0]
    kw = dict(max_new_tokens=11, ignore_eos=True, **PEN_KW)
    a = run_one(make_stream_engine(horizon=1), long_prompt, **kw)
    b = run_one(make_stream_engine(horizon=4), long_prompt, **kw)
    assert a.tokens == b.tokens


def test_streamed_unpenalized_lane_isolated_from_penalized():
    long = prompts(2, seed=23, lo=40, hi=41)
    eng_a = make_stream_engine()
    ra = eng_a.add_request(long[0], max_new_tokens=10, ignore_eos=True)
    outs_a = {o.req_id: o.tokens for o in eng_a.run()}
    eng_b = make_stream_engine()
    rb = eng_b.add_request(long[0], max_new_tokens=10, ignore_eos=True)
    eng_b.add_request(long[1], max_new_tokens=10, ignore_eos=True, **PEN_KW)
    outs_b = {o.req_id: o.tokens for o in eng_b.run()}
    assert outs_a[ra] == outs_b[rb]


def test_streamed_session_turn_penalties():
    """Per-turn penalty state on a streamed session turn matches the
    POOLED session turn token-for-token (greedy). The documented
    per-turn semantics (continue_session docstring): counts reset at the
    turn's first chunk and the repetition span covers the tokens this
    turn FEEDS — a live restored turn does not re-scan KV-resident
    history — so the parity reference is a pooled session at the same
    point, not a fresh request fed the full history."""
    long_prompt = prompts(1, seed=24, lo=40, hi=41)[0]
    cont = [9, 4, 2]

    def two_turns(eng):
        rid = eng.add_request(long_prompt, max_new_tokens=6, session=True,
                              ignore_eos=True)
        out1 = {o.req_id: o for o in eng.run()}[rid]
        rid2 = eng.continue_session(out1.session_id, cont, max_new_tokens=6,
                                    **PEN_KW)
        out2 = {o.req_id: o for o in eng.run()}[rid2]
        return out1.tokens, out2.tokens

    s1, s2 = two_turns(make_stream_engine())
    p1, p2 = two_turns(make_engine(hbm_blocks=64))
    assert len(s2) == 6
    assert s1 == p1          # turn 1 (penalty-free) cross-path identity
    assert s2 == p2          # penalized turn 2: streamed == pooled


def test_cancel_frees_row():
    eng = make_engine(penalty_rows=1)
    rid = eng.add_request(prompts(1)[0], max_new_tokens=50,
                          frequency_penalty=1.0)
    eng.step()
    assert eng.cancel(rid) is not None
    assert len(eng._pen_free) == 1


def test_mesh_engine_penalties_match_single_device():
    """Penalty state under a dp x tp mesh (plane replicated, lanes sharded
    over dp) produces the same tokens as the unsharded engine."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from cxl_speckv_tpu.config import ParallelConfig

    def engine(dp, tp):
        sc = SystemConfig(
            cache=CacheConfig(block_size=8, num_hbm_blocks=64,
                              num_host_blocks=64, kv_dtype=KVDtype.INT8),
            prefetch=PrefetchConfig(enabled=False),
            engine=EngineConfig(max_batch_size=4, max_seq_len=128,
                                prefill_chunk=32, decode_horizon=2),
            parallel=ParallelConfig(dp=dp, tp=tp),
        )
        return Engine(CFG, sc, params=PARAMS, use_pallas=False,
                      enable_lstm=False)

    ps = prompts(2, seed=23)
    kw = dict(max_new_tokens=10, ignore_eos=True, frequency_penalty=1.3,
              repetition_penalty=1.4)
    single = engine(1, 1)
    ids_a = [single.add_request(p, **kw) for p in ps]
    outs_a = {o.req_id: o.tokens for o in single.run()}
    mesh = engine(2, 2)
    ids_b = [mesh.add_request(p, **kw) for p in ps]
    outs_b = {o.req_id: o.tokens for o in mesh.run()}
    for a, b in zip(ids_a, ids_b):
        assert outs_a[a] == outs_b[b]
