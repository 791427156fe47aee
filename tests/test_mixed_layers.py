"""Per-layer mixed-precision KV schemes (CacheConfig.layer_kv_dtypes).

The reference keeps a per-layer compression-ratio table
(`cache_engine.cpp:25-33`); here the analog is a per-layer scheme table
over the byte-storage schemes (INT8 / FP8 share one int8 pool, so one
set of pools serves the mix — MIXED8 programs select the interpretation
per layer by a traced scheme id).

Decisive invariants: a degenerate all-INT8 (all-FP8) table is
token-identical to the uniform engine, and a genuinely mixed table is
token-identical between the reference and Pallas-interpret attention
paths and across tiering (oversubscription-invisible like every scheme).
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


def make_engine(layer_dtypes=None, kv_dtype=KVDtype.INT8, hbm=256, host=256,
                use_pallas=False, horizon=1):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=kv_dtype,
                          layer_kv_dtypes=layer_dtypes),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=2, max_seq_len=128,
                            prefill_chunk=32, decode_horizon=horizon),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=use_pallas,
                  enable_lstm=False, seed=0)


def prompts(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(1, CFG.vocab_size, rng.randint(6, 20)).tolist()
            for _ in range(n)]


MIXED = tuple(KVDtype.INT8 if i % 2 == 0 else KVDtype.FP8
              for i in range(CFG.num_layers))


@pytest.mark.parametrize("uni", [KVDtype.INT8, KVDtype.FP8])
def test_degenerate_table_matches_uniform(uni):
    ps = prompts(4, seed=1)
    ref = make_engine(kv_dtype=uni)
    want = {o.req_id: o.tokens for o in _run(ref, ps)}
    eng = make_engine(layer_dtypes=(uni,) * CFG.num_layers)
    got = {o.req_id: o.tokens for o in _run(eng, ps)}
    assert want == got


def _run(eng, ps, gen=10):
    for p in ps:
        eng.add_request(p, max_new_tokens=gen)
    return eng.run()


def test_mixed_table_ref_matches_pallas_interpret():
    ps = prompts(4, seed=2)
    a = {o.req_id: o.tokens for o in _run(make_engine(MIXED), ps)}
    b = {o.req_id: o.tokens
         for o in _run(make_engine(MIXED, use_pallas=True), ps)}
    assert a == b
    assert any(len(t) for t in a.values())


def test_mixed_table_tiering_invisible():
    """Oversubscribed mixed-scheme engine == ample mixed-scheme engine."""
    ps = prompts(6, seed=3)
    ample = {o.req_id: o.tokens for o in _run(make_engine(MIXED), ps)}
    tiered = {o.req_id: o.tokens
              for o in _run(make_engine(MIXED, hbm=12, host=256, horizon=4), ps)}
    assert ample == tiered


def test_mixed_table_validation():
    with pytest.raises(ValueError):
        CacheConfig(layer_kv_dtypes=(KVDtype.INT4,) * CFG.num_layers).validate()
    with pytest.raises(ValueError):
        make_engine(layer_dtypes=(KVDtype.INT8,))  # wrong length
    eng = make_engine(MIXED)
    with pytest.raises(ValueError):
        eng.set_kv_dtype(KVDtype.FP8)  # knob disabled under a layer table
