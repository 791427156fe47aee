"""Feature matrix x mesh (VERDICT r2 items 1 and 5).

Round 2 left two gaps: the Pallas kernels were disabled under a mesh
(engine fell back to the jnp reference attention), and the serving features
(speculative decoding, prefix caching, scheme switching, sessions) were
tested single-device only. These tests pin both:

- `use_pallas=True` under a dp x tp mesh runs the shard-mapped kernels
  (`parallel/shard_kernels.py`) and is token-identical to the single-device
  Pallas engine — same programs, same math, GSPMD only changes layout;
- every serving feature is token-identical single-device vs dp x tp.
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
from cxl_speckv_tpu.models.configs import LlamaConfig, tiny_test_config
from cxl_speckv_tpu.models.llama import init_params

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))
DRAFT_CFG = LlamaConfig(
    vocab_size=CFG.vocab_size, hidden_size=32, intermediate_size=64,
    num_layers=1, num_q_heads=2, num_kv_heads=2, head_dim=16,
    rope_theta=10000.0, tie_embeddings=False, max_seq_len=512,
    eos_token_id=0, dtype="float32",
)
DRAFT_PARAMS = init_params(DRAFT_CFG, jax.random.PRNGKey(7))


def make_engine(dp=1, tp=1, hbm=32, host=64, horizon=2, use_pallas=True,
                spec=False, ngram=False, gamma=3):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=96,
                            prefill_chunk=32, decode_horizon=horizon),
        parallel=ParallelConfig(dp=dp, tp=tp),
    )
    kw = {}
    if spec:
        kw = dict(draft_config=DRAFT_CFG, draft_params=DRAFT_PARAMS,
                  spec_gamma=gamma)
    if ngram:
        kw = dict(spec_ngram=True, spec_gamma=gamma)
    return Engine(CFG, sc, params=PARAMS, use_pallas=use_pallas,
                  enable_lstm=False, seed=0, **kw)


def prompts(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(1, CFG.vocab_size, rng.randint(6, 20)).tolist()
            for _ in range(n)]


def run_all(eng, ps, gen=10):
    ids = [eng.add_request(p, max_new_tokens=gen) for p in ps]
    outs = {o.req_id: o.tokens for o in eng.run()}
    return [outs[i] for i in ids]


# -- Pallas kernels under the mesh (VERDICT item 1) --------------------------


def test_mesh_pallas_engine_matches_single_device():
    """The shard-mapped decode + chunk kernels serve token-identically to
    the single-device Pallas engine on a dp=2 x tp=2 mesh."""
    ps = prompts(4, seed=1)
    ref = run_all(make_engine(use_pallas=True), ps)
    got = run_all(make_engine(dp=2, tp=2, use_pallas=True), ps)
    assert got == ref


def test_mesh_pallas_engine_is_kernel_path():
    """Sanity: the mesh engine really selects the kernels (use_pallas
    survives mesh construction — round 2 silently forced it off)."""
    eng = make_engine(dp=2, tp=2, use_pallas=True)
    assert eng.mesh is not None and eng.use_pallas
    assert eng.spec is None


def test_mesh_pallas_tiered_oversubscription():
    """Kernels + tiering + migration on the mesh == ample single-device."""
    ps = prompts(6, seed=3)
    ref = run_all(make_engine(hbm=64, host=0, use_pallas=True), ps)
    got = run_all(make_engine(dp=2, tp=2, hbm=10, host=64, use_pallas=True),
                  ps)
    assert got == ref


# -- feature matrix x mesh (VERDICT item 5) ----------------------------------


def test_mesh_spec_decode_matches_single_device_and_greedy():
    """Draft-model speculative decoding under the mesh: token-identical to
    the single-device spec engine AND to plain greedy (the spec invariant),
    with the draft sharded over the same mesh (its heads divide tp)."""
    ps = prompts(4, seed=5)
    plain = run_all(make_engine(use_pallas=False, horizon=1), ps)
    ref = run_all(make_engine(spec=True, use_pallas=False), ps)
    eng = make_engine(dp=2, tp=2, spec=True, use_pallas=False)
    assert eng.spec.mesh is not None  # draft sharded, not replicated
    got = run_all(eng, ps)
    assert got == ref == plain


def test_mesh_spec_decode_pallas():
    """Spec decoding with the shard-mapped kernels (target + draft)."""
    ps = prompts(4, seed=6)
    ref = run_all(make_engine(spec=True, use_pallas=True), ps)
    got = run_all(make_engine(dp=2, tp=2, spec=True, use_pallas=True), ps)
    assert got == ref


def test_mesh_spec_draft_replicated_when_incompatible():
    """A draft whose heads don't divide tp serves replicated (ref
    attention) while the target keeps the sharded kernels."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    draft = LlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=16, intermediate_size=32,
        num_layers=1, num_q_heads=1, num_kv_heads=1, head_dim=16,
        rope_theta=10000.0, tie_embeddings=False, max_seq_len=512,
        eos_token_id=0, dtype="float32")
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=32,
                          num_host_blocks=64, kv_dtype=KVDtype.INT8),
        engine=EngineConfig(max_batch_size=4, max_seq_len=96,
                            prefill_chunk=32),
        parallel=ParallelConfig(dp=2, tp=2),
    )
    eng = Engine(CFG, sc, params=PARAMS, use_pallas=True, enable_lstm=False,
                 draft_config=draft,
                 draft_params=init_params(draft, jax.random.PRNGKey(9)))
    assert eng.use_pallas and eng.mesh is not None
    assert eng.spec.mesh is None and not eng.spec.use_pallas
    ps = prompts(3, seed=7)
    ref_eng = Engine(CFG, SystemConfig(
        cache=sc.cache, engine=sc.engine), params=PARAMS, use_pallas=True,
        enable_lstm=False, draft_config=draft,
        draft_params=init_params(draft, jax.random.PRNGKey(9)))
    assert run_all(eng, ps) == run_all(ref_eng, ps)


def test_mesh_ngram_spec_matches_single_device():
    ps = prompts(4, seed=8)
    ref = run_all(make_engine(ngram=True, use_pallas=True), ps)
    got = run_all(make_engine(dp=2, tp=2, ngram=True, use_pallas=True), ps)
    assert got == ref


def test_mesh_prefix_cache_identity():
    """Shared-prefix reuse under the mesh: cached == uncached streams and
    the second request actually claims blocks."""
    shared = list(range(1, 25))  # 3 full blocks of shared prefix
    # 6 requests > max_batch_size 4: the second prefill wave claims the
    # prefix blocks the first wave registered
    ps = [shared + [30 + i] for i in range(6)]
    ref = run_all(make_engine(use_pallas=True), ps, gen=8)
    eng = make_engine(dp=2, tp=2, use_pallas=True)
    got = run_all(eng, ps, gen=8)
    assert got == ref
    assert eng.kvc.stats.prefix_hit_blocks > 0


def test_mesh_scheme_switch_identity():
    """set_kv_dtype mid-serve under the mesh: mixed INT8/FP8 lanes decode
    in scheme-homogeneous groups, token-identical to single-device."""
    ps = prompts(4, seed=9)

    def serve(eng):
        ids = [eng.add_request(p, max_new_tokens=8) for p in ps[:2]]
        eng.set_kv_dtype(KVDtype.FP8)
        ids += [eng.add_request(p, max_new_tokens=8) for p in ps[2:]]
        outs = {o.req_id: o.tokens for o in eng.run()}
        return [outs[i] for i in ids]

    ref = serve(make_engine(use_pallas=True))
    got = serve(make_engine(dp=2, tp=2, use_pallas=True))
    assert got == ref


def test_mesh_sessions_identity():
    """Multi-turn sessions (restore + reclaim/re-prefill) under the mesh."""
    t1 = list(range(1, 15))
    t2 = [40, 41, 42]

    def serve(eng):
        rid = eng.add_request(t1, max_new_tokens=6, session=True)
        out1 = {o.req_id: o for o in eng.run()}[rid]
        rid2 = eng.continue_session(out1.session_id, t2, max_new_tokens=6)
        out2 = {o.req_id: o for o in eng.run()}[rid2]
        return out1.tokens, out2.tokens

    assert serve(make_engine(dp=2, tp=2, use_pallas=True)) == \
        serve(make_engine(use_pallas=True))


def test_mesh_logprobs_identity():
    """Per-token logprobs under the mesh match single-device values."""
    ps = prompts(2, seed=11)

    def serve(eng):
        ids = [eng.add_request(p, max_new_tokens=6, logprobs=3) for p in ps]
        outs = {o.req_id: o for o in eng.run()}
        return [(outs[i].tokens, outs[i].logprobs) for i in ids]

    ref = serve(make_engine(use_pallas=True))
    got = serve(make_engine(dp=2, tp=2, use_pallas=True))
    for (rt, rl), (gt, gl) in zip(ref, got):
        assert rt == gt
        for a, b in zip(rl, gl):
            assert a["top_ids"] == b["top_ids"]
            # GSPMD reduction order (tp psum vs local accumulate) shifts
            # float values at the ~1e-3 level; tokens/ids stay identical
            np.testing.assert_allclose(a["logprob"], b["logprob"], atol=5e-3,
                                       rtol=1e-3)
