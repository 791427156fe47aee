"""End-to-end engine run on the native (C++) residency directory.

The native backend must be behaviorally identical: generation under
oversubscription with the C++ directory matches the Python directory
token-for-token.
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

try:
    from cxl_speckv_tpu.native import native_available
    HAVE = native_available()
except Exception:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="native runtime unavailable")

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))


def make_engine(native):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=12, num_host_blocks=256,
                          kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=2, max_seq_len=128, prefill_chunk=32),
    )
    eng = Engine.__new__(Engine)
    # build normally but force the directory backend
    import cxl_speckv_tpu.runtime.kv_cache as kvmod
    orig = kvmod.TieredKVCache.__init__
    def patched(self, *a, **kw):
        kw["native"] = native
        return orig(self, *a, **kw)
    kvmod.TieredKVCache.__init__ = patched
    try:
        eng.__init__(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False)
    finally:
        kvmod.TieredKVCache.__init__ = orig
    return eng


def test_native_backend_matches_python():
    rng = np.random.RandomState(3)
    prompts = [rng.randint(1, 256, rng.randint(6, 20)).tolist() for _ in range(6)]

    py = make_engine(native=False)
    for p in prompts:
        py.add_request(p, max_new_tokens=10)
    want = {o.req_id: o.tokens for o in py.run()}
    st_py = py.get_statistics()

    nat = make_engine(native=True)
    for p in prompts:
        nat.add_request(p, max_new_tokens=10)
    got = {o.req_id: o.tokens for o in nat.run()}
    st_nat = nat.get_statistics()

    assert want.keys() == got.keys()
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged on native backend"
    # migration happened on both, and core counters agree
    assert st_nat["transfer"]["up_transfers"] > 0
    for key in ("allocations", "frees", "promotions"):
        assert st_nat["directory"][key] == st_py["directory"][key], key
