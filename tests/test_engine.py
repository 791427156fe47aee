"""End-to-end engine tests.

The decisive invariant: greedy generation under heavy KV oversubscription
(HBM pool far smaller than total KV, blocks migrating host<->HBM every step)
must be IDENTICAL to generation with ample HBM — tiering must be
correctness-invisible, only a performance property. This is the whole-system
analog of the reference's claim that the CXL tier preserves model behavior.
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


def make_engine(hbm_blocks=256, host_blocks=256, batch=4, kv_dtype=KVDtype.INT8,
                lstm=False, seed=0, horizon=1, fused=False):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm_blocks,
                          num_host_blocks=host_blocks, kv_dtype=kv_dtype),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=batch, max_seq_len=128,
                            prefill_chunk=32, decode_horizon=horizon,
                            fused_rounds=fused),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False,
                  enable_lstm=lstm, seed=seed)


def prompts(n, rng_seed=0, lo=4, hi=20):
    rng = np.random.RandomState(rng_seed)
    return [rng.randint(1, CFG.vocab_size, rng.randint(lo, hi)).tolist()
            for _ in range(n)]


def test_single_request_generates():
    eng = make_engine()
    rid = eng.add_request(prompts(1)[0], max_new_tokens=8)
    outs = eng.run()
    assert len(outs) == 1
    assert outs[0].req_id == rid
    assert len(outs[0].tokens) == 8 or outs[0].finish_reason == "eos"
    st = eng.get_statistics()
    assert st["engine"]["tokens_generated"] >= len(outs[0].tokens)


def test_batch_requests_complete():
    eng = make_engine(batch=4)
    ids = [eng.add_request(p, max_new_tokens=6) for p in prompts(6)]
    outs = eng.run()
    assert sorted(o.req_id for o in outs) == sorted(ids)
    for o in outs:
        assert 1 <= len(o.tokens) <= 6


def test_oversubscription_matches_ample_hbm():
    """8 requests x up to ~40 tokens each vs an HBM pool of only 12 blocks
    (96 token slots): blocks must migrate constantly. Outputs must match the
    ample-HBM run token-for-token."""
    ps = prompts(8, rng_seed=3, lo=6, hi=24)

    ample = make_engine(hbm_blocks=256, batch=2)
    for p in ps:
        ample.add_request(p, max_new_tokens=12)
    outs_a = {o.req_id: o.tokens for o in ample.run()}

    tight = make_engine(hbm_blocks=12, host_blocks=256, batch=2)
    for p in ps:
        tight.add_request(p, max_new_tokens=12)
    outs_t = {o.req_id: o.tokens for o in tight.run()}

    assert outs_a.keys() == outs_t.keys()
    for rid in outs_a:
        assert outs_a[rid] == outs_t[rid], f"request {rid} diverged under tiering"

    st = tight.get_statistics()
    assert st["transfer"]["down_transfers"] > 0, "no demotions — not oversubscribed?"
    assert st["transfer"]["up_transfers"] > 0, "no promotions happened"


def test_prefetcher_converts_misses_to_hits():
    """With prefetch enabled, most accesses should be HBM hits even when
    oversubscribed; demand fetches should be a small fraction."""
    eng = make_engine(hbm_blocks=16, host_blocks=256, batch=2)
    for p in prompts(8, rng_seed=5, lo=8, hi=16):
        eng.add_request(p, max_new_tokens=10)
    eng.run()
    st = eng.get_statistics()
    d = st["directory"]
    assert d["accesses"] > 0
    assert d["hit_rate"] > 0.6, f"hit rate too low: {d['hit_rate']}"
    assert st["prefetch"]["prefetches_issued"] > 0


def test_multi_horizon_matches_single_step():
    """Fused 4-token decode must emit the same greedy tokens as step-by-step,
    including under oversubscription (migration between fused steps)."""
    ps = prompts(6, rng_seed=11, lo=6, hi=20)
    single = make_engine(batch=2, horizon=1)
    for p in ps:
        single.add_request(p, max_new_tokens=11)
    want = {o.req_id: o.tokens for o in single.run()}

    fused = make_engine(batch=2, horizon=4, hbm_blocks=14, host_blocks=256)
    for p in ps:
        fused.add_request(p, max_new_tokens=11)
    got = {o.req_id: o.tokens for o in fused.run()}
    assert want.keys() == got.keys()
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged under horizon=4"
    st = fused.get_statistics()
    assert st["transfer"]["up_transfers"] > 0  # tiering active during fusion


def test_fused_rounds_match_split_pipeline():
    """Opt-in fused rounds (migration batch folded into the decode/prefill
    program, EngineConfig.fused_rounds) must be token-identical to the
    default split pipeline under oversubscription."""
    ps = prompts(6, rng_seed=13, lo=6, hi=20)
    split = make_engine(batch=2, horizon=4, hbm_blocks=14, host_blocks=256)
    for p in ps:
        split.add_request(p, max_new_tokens=11)
    want = {o.req_id: o.tokens for o in split.run()}
    assert not split._fused_rounds

    fused = make_engine(batch=2, horizon=4, hbm_blocks=14, host_blocks=256,
                        fused=True)
    assert fused._fused_rounds
    for p in ps:
        fused.add_request(p, max_new_tokens=11)
    got = {o.req_id: o.tokens for o in fused.run()}
    assert want == got
    st = fused.get_statistics()
    assert st["transfer"]["up_transfers"] > 0


def test_deterministic_given_seed():
    outs1 = None
    for _ in range(2):
        eng = make_engine(seed=7)
        for p in prompts(3, rng_seed=9):
            eng.add_request(p, max_new_tokens=5, temperature=0.8)
        outs = {o.req_id: o.tokens for o in eng.run()}
        if outs1 is None:
            outs1 = outs
        else:
            assert outs == outs1


def test_eos_stops_generation():
    eng = make_engine()
    # eos_token_id=0 in tiny config; force it immediately via a crafted request
    rid = eng.add_request([5, 5, 5], max_new_tokens=50, eos_token_id=None)
    # find what greedy generates; then re-run with eos set to that token
    outs = eng.run()
    first_tok = outs[0].tokens[0]
    eng2 = make_engine()
    eng2.add_request([5, 5, 5], max_new_tokens=50, eos_token_id=first_tok)
    outs2 = eng2.run()
    assert outs2[0].finish_reason == "eos"
    assert len(outs2[0].tokens) == 1


def test_statistics_surface_complete():
    eng = make_engine(lstm=True)
    eng.add_request(prompts(1)[0], max_new_tokens=4)
    eng.run()
    st = eng.get_statistics()
    for section in ("engine", "scheduler", "prefetch", "directory",
                    "transfer", "pool", "runtime"):
        assert section in st, f"missing stats section {section}"
    assert "hit_rate" in st["directory"]
    assert "decode_tokens_per_s" in st["engine"]
    eng.reset_statistics()
    assert eng.get_statistics()["engine"]["tokens_generated"] == 0


def test_runtime_prefetch_depth_knob():
    eng = make_engine()
    eng.set_prefetch_depth(6)
    assert eng.prefetcher.depth == 6
    eng.set_prefetch_depth(100)
    assert eng.prefetcher.depth == eng.config.prefetch.max_depth


def test_prefill_lanes_widens_dispatch_token_identical():
    """r4: prefill_lanes > max_batch_size chunks more queued prompts per
    prefill dispatch (fewer dispatches — each costs ~25 ms on remote
    runtimes, round_anatomy) without changing a single token."""
    def build(pfl):
        sc = SystemConfig(
            cache=CacheConfig(block_size=8, num_hbm_blocks=64,
                              num_host_blocks=128, kv_dtype=KVDtype.INT8),
            prefetch=PrefetchConfig(enabled=False),
            engine=EngineConfig(max_batch_size=2, max_seq_len=96,
                                prefill_chunk=32, decode_horizon=2,
                                prefill_lanes=pfl),
        )
        return Engine(CFG, sc, params=PARAMS, use_pallas=False,
                      enable_lstm=False)

    ps = prompts(8, rng_seed=3)

    def run(eng):
        ids = [eng.add_request(p, max_new_tokens=6) for p in ps]
        outs = {o.req_id: o for o in eng.run()}
        return ([outs[i].tokens for i in ids],
                eng.get_statistics()["engine"]["prefill_dispatches"])

    narrow_toks, narrow_n = run(build(0))
    wide_toks, wide_n = run(build(8))
    assert narrow_toks == wide_toks
    assert wide_n < narrow_n, (wide_n, narrow_n)


def test_prefill_wave_cannot_evict_held_decode_residency():
    """r5 residency classes (VERDICT r4 #3): a wide prefill wave sizes
    itself into the HBM the held decode group does NOT occupy — the
    decoding sequences' blocks stay resident across prefill waves instead
    of being evicted and demand-fetched back at the next decode round
    (reference hot/pinned eviction classes,
    `cxl_memory_manager.cpp:245-293`)."""
    from cxl_speckv_tpu.core.directory import BlockState

    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=20,
                          num_host_blocks=128, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=False),
        engine=EngineConfig(max_batch_size=2, max_seq_len=96,
                            prefill_chunk=32, decode_horizon=1,
                            sched_quantum=4, prefill_lanes=8),
    )
    eng = Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)
    rng = np.random.RandomState(7)
    first = [rng.randint(1, CFG.vocab_size, 32).tolist() for _ in range(2)]
    for p in first:
        eng.add_request(p, max_new_tokens=24)
    # prefill the first pair and start decoding (they become the held group)
    for _ in range(3):
        eng.step()
    held = eng.scheduler.held_batch_slots()
    assert held, "decode group should be running"
    # a wide wave of new prompts arrives; without the residency class its
    # combined working set (8 lanes x 4 blocks = 32 > 18 usable slots)
    # evicts the held group's blocks
    for _ in range(8):
        eng.add_request(rng.randint(1, CFG.vocab_size, 32).tolist(),
                        max_new_tokens=4)
    for _ in range(2):
        eng.step()
        for s in held:
            for bid in eng.kvc.pool.seq(s).live_blocks:
                st = eng.kvc.directory.entry(bid).state
                assert st != BlockState.HOST, (
                    f"prefill wave evicted held decode block {bid}")
    # liveness: everything still completes
    outs = eng.run()
    assert len(outs) == 10
    assert all(o.finish_reason in ("length", "eos") for o in outs)


def test_decode_horizon_auto_derivation():
    """decode_horizon=0 (the default, r5): the engine measures the
    runtime's dispatch constant once per process and derives the fused
    horizon from it and the model's weight-stream size — remote-TPU-class
    dispatch constants derive 8-32 by model size, local/CPU backends
    derive 1 (utils/dispatch.py calibration points)."""
    import cxl_speckv_tpu.utils.dispatch as dd
    from cxl_speckv_tpu.utils.dispatch import (
        derive_decode_horizon, params_byte_size)

    saved = dd._dispatch_ms_cache
    try:
        dd._dispatch_ms_cache = 25.0      # remote-tunnel-class dispatch
        assert derive_decode_horizon(int(1.24e9)) == 32   # 1B int8
        assert derive_decode_horizon(int(8.0e9)) == 32    # 8B int8 (r5 A/B)
        dd._dispatch_ms_cache = 5.0       # faster remote dispatch
        assert derive_decode_horizon(int(8.0e9)) == 8
        dd._dispatch_ms_cache = 0.1       # local-backend-class dispatch
        assert derive_decode_horizon(int(1.24e9)) == 1
        # SPECKV_DISPATCH_MS pins the constant without measuring (the
        # conftest sets it so a loaded CI machine can't inflate it and
        # flip scheduling semantics run-to-run)
        dd._dispatch_ms_cache = None
        assert dd.measured_dispatch_ms() == 0.05
    finally:
        dd._dispatch_ms_cache = saved
    # engine with the auto default resolves a concrete horizon and serves
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=32,
                          num_host_blocks=64, kv_dtype=KVDtype.INT8),
        engine=EngineConfig(max_batch_size=2, max_seq_len=96,
                            prefill_chunk=32))
    assert sc.engine.decode_horizon == 0
    eng = Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)
    assert eng.config.engine.decode_horizon >= 1
    assert params_byte_size(PARAMS) > 0
    rid = eng.add_request(prompts(1)[0], max_new_tokens=6)
    outs = eng.run()
    assert outs[0].req_id == rid
