"""Mesh-integrated serving engine: dp x tp sharded Engine on the virtual
8-device CPU mesh must produce token-identical output to the single-device
engine (same programs, same math — GSPMD only changes the layout).

Covers VERDICT r1 item 3: Engine(system_config.parallel) shards weights +
KV pools (+ the host-tier store) and runs the identical step loop,
including tiered oversubscription and host-streamed requests.
"""

import jax
import numpy as np
import pytest

from cxl_speckv_tpu.config import (
    CacheConfig,
    EngineConfig,
    KVDtype,
    ParallelConfig,
    PrefetchConfig,
    SystemConfig,
)
from cxl_speckv_tpu.engine.engine import Engine
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import init_params

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))


def make_engine(dp=1, tp=1, hbm=32, host=64, horizon=2):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=96,
                            prefill_chunk=32, decode_horizon=horizon),
        parallel=ParallelConfig(dp=dp, tp=tp),
    )
    return Engine(CFG, sc, params=PARAMS, use_pallas=False,
                  enable_lstm=False, seed=0)


def prompts(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(1, CFG.vocab_size, rng.randint(6, 20)).tolist()
            for _ in range(n)]


def run_all(eng, ps, gen=10):
    ids = [eng.add_request(p, max_new_tokens=gen) for p in ps]
    outs = {o.req_id: o.tokens for o in eng.run()}
    return [outs[i] for i in ids]


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2), (4, 2)])
def test_mesh_engine_matches_single_device(dp, tp):
    if dp * tp > len(jax.devices()):
        pytest.skip("not enough devices")
    ps = prompts(4, seed=1)
    ref = run_all(make_engine(), ps)
    got = run_all(make_engine(dp=dp, tp=tp), ps)
    assert got == ref


def test_mesh_engine_sharded_layouts():
    eng = make_engine(dp=2, tp=2)
    assert eng.mesh is not None
    # weights: q column-sharded over tp
    q = eng.params["layers"]["q"]
    spec = q.sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, None, "tp")
    # pools: kT's head-major column axis over tp; V's kv-head axis over tp
    kspec = eng.kvc.k_pools.sharding.spec
    assert kspec[3] == "tp" and kspec[2] is None   # [L, S, Dp, Hkv*bs]
    assert eng.kvc.v_pools.sharding.spec[2] == "tp"
    # host store rows sharded over tp on the head axis (CPU: plain arrays,
    # sharding still applies via GSPMD layout)
    eng.add_request(prompts(1, 7)[0], max_new_tokens=4)
    eng.run()


def test_mesh_engine_with_oversubscription():
    """Tiering + migration under the mesh: more live KV than HBM, identical
    tokens to the ample single-device engine."""
    ps = prompts(6, seed=3)
    ref = run_all(make_engine(hbm=64, host=0), ps)
    got = run_all(make_engine(dp=2, tp=2, hbm=10, host=64), ps)
    assert got == ref


def test_mesh_engine_streamed_request():
    """Host-streamed sequence under the mesh (store sharded over tp)."""
    prompt = np.random.RandomState(5).randint(1, CFG.vocab_size, 40).tolist()
    eng = make_engine(dp=2, tp=2, hbm=6, host=64)
    rid = eng.add_request(prompt, max_new_tokens=8)
    assert eng._stream_queue
    outs = eng.run()
    assert len(outs) == 1 and len(outs[0].tokens) == 8

    ref_eng = make_engine(hbm=64, host=64)
    ref_eng.add_request(prompt, max_new_tokens=8)
    ref = ref_eng.run()
    assert outs[0].tokens == ref[0].tokens
