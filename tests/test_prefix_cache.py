"""Prefix caching: content-addressed reuse of full prompt-prefix blocks
across concurrently-live requests (refcount-shared, read-only by
construction).

The core invariant is BIT-identity: a reused block contains exactly the
quantized KV bytes a fresh prefill would have written (same tokens, same
absolute positions, same scheme), so cached serving must produce
token-identical output to an engine with the cache disabled.
"""

import dataclasses

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
from cxl_speckv_tpu.models.configs import LlamaConfig, tiny_test_config
from cxl_speckv_tpu.models.llama import init_params

BS = 8
CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))
DRAFT_CFG = LlamaConfig(
    vocab_size=CFG.vocab_size, hidden_size=32, intermediate_size=64,
    num_layers=1, num_q_heads=2, num_kv_heads=2, head_dim=16,
    rope_theta=10000.0, tie_embeddings=False, max_seq_len=512,
    eos_token_id=0, dtype="float32",
)
DRAFT_PARAMS = init_params(DRAFT_CFG, jax.random.PRNGKey(7))


def make_engine(prefix_cache=True, hbm=64, host=64, batch=2, spec=False):
    sc = SystemConfig(
        cache=CacheConfig(block_size=BS, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=KVDtype.INT8,
                          enable_prefix_cache=prefix_cache),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=batch, max_seq_len=128,
                            prefill_chunk=64, decode_horizon=2),
    )
    kw = {}
    if spec:
        kw = dict(draft_config=DRAFT_CFG, draft_params=DRAFT_PARAMS,
                  spec_gamma=3)
    return Engine(CFG, sc, params=PARAMS, use_pallas=False,
                  enable_lstm=False, seed=0, **kw)


def shared_prompts(n=4, prefix_tokens=32, tail=8, seed=0):
    rng = np.random.RandomState(seed)
    prefix = rng.randint(1, CFG.vocab_size, prefix_tokens).tolist()
    return [prefix + rng.randint(1, CFG.vocab_size, tail).tolist()
            for _ in range(n)]


def run_all(eng, prompts, gen=8):
    ids = [eng.add_request(p, max_new_tokens=gen) for p in prompts]
    outs = {o.req_id: o.tokens for o in eng.run()}
    return [outs[i] for i in ids]


# ---------------------------------------------------------------------------
# engine level
# ---------------------------------------------------------------------------

def test_shared_prefix_identical_output_and_fewer_blocks():
    ps = shared_prompts()
    want = run_all(make_engine(prefix_cache=False), ps)
    eng = make_engine(prefix_cache=True)
    got = run_all(eng, ps)
    assert got == want
    st = eng.get_statistics()
    # the later requests (beyond the first prefill wave) claimed the
    # 32-token / 4-block shared prefix instead of re-prefilling it
    assert st["runtime"]["prefix_hit_blocks"] >= 4
    assert st["runtime"]["prefix_tokens_reused"] >= 32
    assert st["pool"]["blocks_shared"] == st["runtime"]["prefix_hit_blocks"]


def test_no_stale_reuse_after_free():
    """Once every holder of a cached block is gone, the entry is dead —
    a later identical prompt re-prefills (validated via pool.is_live) and
    still produces the uncached output."""
    ps = shared_prompts(n=1)
    eng = make_engine(prefix_cache=True)
    first = run_all(eng, ps)
    assert eng.get_statistics()["runtime"]["prefix_hit_blocks"] == 0
    second = run_all(eng, ps)   # same engine, request is long gone
    assert second == first
    assert eng.get_statistics()["runtime"]["prefix_hit_blocks"] == 0


def test_prefix_hit_against_live_session():
    """A session keeps its KV alive between turns; a later plain request
    with the same prompt prefix claims the session's blocks."""
    ps = shared_prompts(n=2, prefix_tokens=32, tail=8, seed=3)
    ref = run_all(make_engine(prefix_cache=False), ps)

    eng = make_engine(prefix_cache=True)
    sid = eng.add_request(ps[0], max_new_tokens=8, session=True)
    out0 = {o.req_id: o.tokens for o in eng.run()}[sid]
    rid = eng.add_request(ps[1], max_new_tokens=8)
    out1 = {o.req_id: o.tokens for o in eng.run()}[rid]
    assert [out0, out1] == ref
    assert eng.get_statistics()["runtime"]["prefix_hit_blocks"] == 4


def test_tiered_oversubscription_with_prefix_cache():
    """Shared blocks migrate like any other (multi-holder table sync):
    tight-HBM cached serving matches the ample uncached engine."""
    ps = shared_prompts(n=6, prefix_tokens=24, tail=12, seed=5)
    want = run_all(make_engine(prefix_cache=False, hbm=64, host=0), ps)
    eng = make_engine(prefix_cache=True, hbm=14, host=64)
    got = run_all(eng, ps)
    assert got == want
    st = eng.get_statistics()
    assert st["runtime"]["prefix_hit_blocks"] > 0
    assert st["transfer"]["up_transfers"] > 0   # tiering was active


def test_spec_decode_with_prefix_cache():
    """Prefix caching composes with speculative decoding: draft-cache slots
    are keyed by bid and survive until the LAST holder frees, and the shared
    draft KV is bit-valid for claimers (same tokens, same positions) — so
    cached spec serving is token-identical to uncached spec serving (which
    is itself greedy-identical to the plain engine)."""
    ps = shared_prompts(n=4, prefix_tokens=32, tail=8, seed=7)
    want = run_all(make_engine(prefix_cache=False, spec=True), ps)
    assert want == run_all(make_engine(prefix_cache=False), ps)  # spec==plain
    eng = make_engine(prefix_cache=True, spec=True)
    slots_before = len(eng.spec._free)
    got = run_all(eng, ps)
    assert got == want
    st = eng.get_statistics()
    assert st["runtime"]["prefix_hit_blocks"] >= 4
    # every draft slot came back: shared-bid slots were freed exactly once,
    # when the last holder dropped
    assert len(eng.spec._free) == slots_before
    assert not eng.spec._slot_of_bid


# ---------------------------------------------------------------------------
# pool level (both backends)
# ---------------------------------------------------------------------------

try:
    from cxl_speckv_tpu.native import (
        NativeBlockPool,
        NativeResidencyDirectory,
        native_available,
    )
    HAVE_NATIVE = native_available()
except Exception:
    HAVE_NATIVE = False


@pytest.fixture(params=["python"] + (["native"] if HAVE_NATIVE else []))
def pool_backend(request):
    return request.param


def make_pool(backend):
    from cxl_speckv_tpu.core.block_pool import BlockPool
    from cxl_speckv_tpu.core.directory import ResidencyDirectory

    cfg = CacheConfig(num_hbm_blocks=16, num_host_blocks=32, block_size=8,
                      prefetch_reserve_frac=0.0)
    if backend == "native":
        d = NativeResidencyDirectory(cfg)
        return NativeBlockPool(cfg, d, 4, 8), d
    d = ResidencyDirectory(cfg)
    return BlockPool(cfg, d, 4, 8), d


def test_share_refcount_lifecycle(pool_backend):
    pool, d = make_pool(pool_backend)
    s1 = pool.add_seq()
    assert pool.extend(s1, 24)
    bids = pool.seq(s1).blocks[:2]
    s2 = pool.add_seq()
    for b in bids:
        pool.share_block(s2, b)
    assert pool.seq(s2).blocks == bids
    assert pool.table.get(s2, 0) == d.entry(bids[0]).hbm_slot
    free_before = d.hbm_free
    pool.free_seq(s1)            # s2 still references the shared two
    assert d.hbm_free == free_before + 1   # only s1's private 3rd block
    assert pool.is_live(bids[0]) and pool.is_live(bids[1])
    pool.free_seq(s2)
    assert not pool.is_live(bids[0])
    assert d.hbm_free == 16


def test_share_dead_block_rejected(pool_backend):
    pool, _ = make_pool(pool_backend)
    s1 = pool.add_seq()
    pool.extend(s1, 8)
    bid = pool.seq(s1).blocks[0]
    pool.free_seq(s1)
    s2 = pool.add_seq()
    with pytest.raises(KeyError):
        pool.share_block(s2, bid)
