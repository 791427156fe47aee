"""Runtime compression-scheme knob (`Engine.set_kv_dtype`).

Analog of `speckv_set_compression_scheme` (`speckv.h:59-66`, routed to
hardware registers via `speckv_driver.cpp:74-94`): requests submitted after
the switch quantize with the new scheme; blocks already written keep their
encoding — mixed schemes coexist in one pool (INT8 and FP8 share int8-byte
storage, FP8 bitcast).

Decisive invariant: every request's output matches a fresh engine fixed to
that request's scheme — the knob changes encodings, never results.
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


def make_engine(kv_dtype=KVDtype.INT8, hbm=32, host=64, horizon=2):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=kv_dtype),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=96,
                            prefill_chunk=32, decode_horizon=horizon),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)


def prompts(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(1, CFG.vocab_size, rng.randint(6, 20)).tolist()
            for _ in range(n)]


def test_width_switch_semantics():
    eng = make_engine(KVDtype.INT8)
    eng.set_kv_dtype(KVDtype.FP8)       # byte <-> byte: live switch
    eng.set_kv_dtype("int8")            # accepts raw enum values
    # cross-width on an IDLE engine rebuilds storage (r3)
    eng.set_kv_dtype(KVDtype.INT4)
    assert eng.kvc.kv_dtype == KVDtype.INT4
    eng.set_kv_dtype(KVDtype.INT8)
    assert eng.kvc.kv_dtype == KVDtype.INT8


def test_switch_mid_serve_matches_fixed_engines():
    """Serve INT8 requests, switch to FP8 mid-serve, add more: both cohorts
    coexist in one pool and each matches an engine fixed to its scheme."""
    ps8 = prompts(3, seed=1)
    ps_fp8 = prompts(3, seed=2)
    gen = 10

    eng = make_engine(KVDtype.INT8)
    ids8 = [eng.add_request(p, max_new_tokens=gen) for p in ps8]
    # partially serve the INT8 cohort so both cohorts are live together
    for _ in range(3):
        eng.step()
    eng.set_kv_dtype(KVDtype.FP8)
    idsf = [eng.add_request(p, max_new_tokens=gen) for p in ps_fp8]
    outs = {o.req_id: o.tokens for o in eng.run()}
    st = eng.get_statistics()
    assert st["kv_scheme_current"] == "fp8"

    ref8 = make_engine(KVDtype.INT8)
    ids_ref = [ref8.add_request(p, max_new_tokens=gen) for p in ps8]
    outs8 = {o.req_id: o.tokens for o in ref8.run()}
    assert [outs[i] for i in ids8] == [outs8[i] for i in ids_ref]

    reff = make_engine(KVDtype.FP8)
    idsr = [reff.add_request(p, max_new_tokens=gen) for p in ps_fp8]
    outsr = {o.req_id: o.tokens for o in reff.run()}
    assert [outs[i] for i in idsf] == [outsr[i] for i in idsr]


def test_mixed_scheme_decode_batch():
    """Lanes of different schemes in the same decode rotation: the engine
    partitions dispatches by scheme and every lane still finishes."""
    eng = make_engine(KVDtype.INT8, horizon=4)
    a = eng.add_request(prompts(1, 3)[0], max_new_tokens=12)
    eng.set_kv_dtype(KVDtype.FP8)
    b = eng.add_request(prompts(1, 4)[0], max_new_tokens=12)
    outs = {o.req_id: o for o in eng.run()}
    assert len(outs[a].tokens) == 12 and len(outs[b].tokens) == 12
    mix = eng.get_statistics()["kv_scheme_live_tokens"]
    assert mix == {}  # all finished — surface exists and empties cleanly


def test_fp8_engine_matches_fp8_storage_roundtrip():
    """An FP8-native engine on the int8-byte pool produces self-consistent
    output under oversubscription (bitcast storage round-trips through
    migration)."""
    ps = prompts(4, seed=9)
    ample = make_engine(KVDtype.FP8, hbm=64, host=0)
    tight = make_engine(KVDtype.FP8, hbm=8, host=64)
    a = [ample.add_request(p, max_new_tokens=10) for p in ps]
    t = [tight.add_request(p, max_new_tokens=10) for p in ps]
    oa = {o.req_id: o.tokens for o in ample.run()}
    ot = {o.req_id: o.tokens for o in tight.run()}
    assert [ot[i] for i in t] == [oa[i] for i in a]


# -- cross-width switching (r3: idle rebuild) ---------------------------------

def test_cross_width_switch_idle_rebuild():
    """INT8 -> INT4 -> BF16 on an idle engine: pools rebuild in the new
    width and serving continues, matching a fresh engine of that scheme."""
    p = np.random.RandomState(11).randint(1, CFG.vocab_size, 12).tolist()

    eng = make_engine(KVDtype.INT8)
    eng.add_request(p, max_new_tokens=6)
    first = eng.run()[0].tokens

    eng.set_kv_dtype(KVDtype.INT4)           # cross-width, engine idle
    assert eng.kvc.kv_dtype == KVDtype.INT4
    # kT pool halves its sublane (head_dim) axis under INT4 packing
    assert eng.kvc.k_pools.shape[2] == CFG.head_dim // 2
    eng.add_request(p, max_new_tokens=6)
    got4 = eng.run()[0].tokens
    fresh4 = make_engine(KVDtype.INT4)
    fresh4.add_request(p, max_new_tokens=6)
    assert got4 == fresh4.run()[0].tokens

    eng.set_kv_dtype(KVDtype.BF16)
    eng.add_request(p, max_new_tokens=6)
    got16 = eng.run()[0].tokens
    fresh16 = make_engine(KVDtype.BF16)
    fresh16.add_request(p, max_new_tokens=6)
    assert got16 == fresh16.run()[0].tokens


def test_cross_width_switch_rejected_while_busy():
    eng = make_engine(KVDtype.INT8)
    eng.add_request([5, 6, 7, 8], max_new_tokens=8)
    eng.step()
    with pytest.raises(ValueError, match="idle engine"):
        eng.set_kv_dtype(KVDtype.INT4)
    # same-width switching stays legal mid-serve
    eng.set_kv_dtype(KVDtype.FP8)
    eng.run()


def test_cross_width_switch_under_mesh():
    """Idle cross-width rebuild re-places pools with their mesh shardings
    (pool_put roles) and serving stays token-identical to a fresh engine."""
    import jax
    from cxl_speckv_tpu.config import ParallelConfig
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=32,
                          num_host_blocks=64, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=96,
                            prefill_chunk=32),
        parallel=ParallelConfig(dp=2, tp=2),
    )
    eng = Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)
    p = prompts(1, seed=21)[0]
    eng.add_request(p, max_new_tokens=5)
    eng.run()
    eng.set_kv_dtype(KVDtype.INT4)
    from jax.sharding import PartitionSpec as P
    assert eng.kvc.k_pools.sharding.spec == P(None, None, None, "tp")
    eng.add_request(p, max_new_tokens=5)
    got = eng.run()[0].tokens
    fresh = make_engine(KVDtype.INT4)
    fresh.add_request(p, max_new_tokens=5)
    assert got == fresh.run()[0].tokens
