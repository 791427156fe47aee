"""Sampling: temperature / top-k / top-p (nucleus), and their packed
metadata encoding.

The decisive end-to-end invariant: a vanishingly small top_p collapses the
nucleus to the argmax, so temperature-sampled serving with top_p -> 0 must
be token-identical to greedy serving — through the plain engine AND the
speculative-decoding engine (whose acceptance rule runs on the
nucleus-filtered p and q).
"""

import jax
import jax.numpy as jnp
import numpy as np

from cxl_speckv_tpu.config import (
    CacheConfig,
    EngineConfig,
    KVDtype,
    PrefetchConfig,
    SystemConfig,
)
from cxl_speckv_tpu.engine.engine import Engine
from cxl_speckv_tpu.engine.sampling import (
    decode_sampling,
    encode_sampling,
    nucleus_filter,
    sample_tokens,
)
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


# ---------------------------------------------------------------------------
# unit level
# ---------------------------------------------------------------------------

def test_encode_decode_roundtrip():
    col = jnp.array([encode_sampling(t, p)
                     for t, p in [(0.0, 1.0), (0.7, 0.9), (1.5, 0.001),
                                  (0.0, 0.5), (2.0, 1.0)]], jnp.int32)
    temps, top_ps = decode_sampling(col)
    np.testing.assert_allclose(np.asarray(temps), [0.0, 0.7, 1.5, 0.0, 2.0],
                               atol=1e-6)
    # top_p >= 1 encodes as 0 (= off)
    np.testing.assert_allclose(np.asarray(top_ps), [0.0, 0.9, 0.001, 0.5, 0.0],
                               atol=1e-6)


def test_nucleus_filter_minimal_covering_set():
    probs = jnp.array([[0.5, 0.3, 0.15, 0.05]])
    # 0.5 < 0.6 <= 0.5+0.3 -> nucleus = {0, 1}
    out = np.asarray(nucleus_filter(probs, jnp.array([0.6])))[0]
    np.testing.assert_allclose(out, [0.625, 0.375, 0.0, 0.0], atol=1e-6)
    # off (0 or >= 1): unchanged
    for off in (0.0, 1.0):
        out = np.asarray(nucleus_filter(probs, jnp.array([off])))[0]
        np.testing.assert_allclose(out, np.asarray(probs)[0], atol=1e-6)


def test_sample_tokens_top_p_restricts_support():
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]])).repeat(64, axis=0)
    temps = jnp.ones(64)
    top_ps = jnp.full(64, 0.6)
    seen = set()
    for i in range(20):
        toks = np.asarray(sample_tokens(logits, temps, jax.random.PRNGKey(i),
                                        top_ps=top_ps))
        seen.update(toks.tolist())
    assert seen <= {0, 1}
    assert seen == {0, 1}   # both nucleus members appear over 1280 draws


def test_tiny_top_p_is_greedy():
    logits = jax.random.normal(jax.random.PRNGKey(0), (16, 97))
    toks = sample_tokens(logits, jnp.ones(16), jax.random.PRNGKey(1),
                         top_ps=jnp.full(16, 0.001))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(jnp.argmax(logits, -1)))


# ---------------------------------------------------------------------------
# engine level
# ---------------------------------------------------------------------------

def make_engine(spec=False):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=64, num_host_blocks=64,
                          kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=128,
                            prefill_chunk=32, decode_horizon=2),
    )
    kw = {}
    if spec:
        kw = dict(draft_config=DRAFT_CFG, draft_params=DRAFT_PARAMS,
                  spec_gamma=3)
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False,
                  seed=0, **kw)


def prompts(n=4, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(1, CFG.vocab_size, rng.randint(6, 20)).tolist()
            for _ in range(n)]


def run_all(eng, ps, **kw):
    ids = [eng.add_request(p, max_new_tokens=8, **kw) for p in ps]
    outs = {o.req_id: o.tokens for o in eng.run()}
    return [outs[i] for i in ids]


def test_engine_tiny_top_p_matches_greedy():
    ps = prompts()
    greedy = run_all(make_engine(), ps)
    got = run_all(make_engine(), ps, temperature=1.0, top_p=0.001)
    assert got == greedy


def test_spec_engine_tiny_top_p_matches_greedy():
    """Nucleus-filtered speculative sampling: with top_p -> 0 both p and q
    collapse to their argmax, so acceptance == greedy token-match and the
    output equals plain greedy serving."""
    ps = prompts(seed=3)
    greedy = run_all(make_engine(), ps)
    got = run_all(make_engine(spec=True), ps, temperature=1.0, top_p=0.001)
    assert got == greedy


def test_accept_program_top_p_distribution():
    """Nucleus-filtered speculative sampling emits tokens with the TOP-P
    FILTERED target distribution (the same guarantee the plain rule gives
    for the unfiltered target)."""
    from cxl_speckv_tpu.engine.spec import _accept_program

    V, gamma, B, top_p = 8, 2, 20000, 0.6
    k_t, k_d, k_s, k_a = jax.random.split(jax.random.PRNGKey(5), 4)
    t_log = jax.random.normal(k_t, (V,)) * 1.5
    d_log = jax.random.normal(k_d, (V,)) * 1.5
    temps = jnp.full((B,), 1.0)
    top_ps = jnp.full((B,), top_p)
    target_logits = jnp.broadcast_to(t_log, (B, gamma + 1, V))
    draft_logits = jnp.broadcast_to(d_log, (B, gamma, V))
    # drafts sampled from the FILTERED q (as the in-graph draft chain does)
    q_f = nucleus_filter(jax.nn.softmax(d_log)[None], jnp.array([top_p]))[0]
    drafts = jax.random.categorical(
        k_s, jnp.broadcast_to(jnp.log(q_f + 1e-20), (B, gamma, V)),
        axis=-1).astype(jnp.int32)
    n_acc, final = _accept_program(target_logits, draft_logits, drafts,
                                   temps, top_ps, k_a, gamma=gamma)
    n_acc, final, drafts = map(np.asarray, (n_acc, final, drafts))
    first = np.where(n_acc > 0, drafts[:, 0], final)
    emp = np.bincount(first, minlength=V) / B
    want = np.asarray(nucleus_filter(jax.nn.softmax(t_log)[None],
                                     jnp.array([top_p]))[0])
    tv = 0.5 * np.abs(emp - want).sum()
    assert tv < 0.02, (tv, emp, want)


def test_engine_sampled_runs_finish():
    """Moderate top_p sampling serves to completion (no NaNs / empty
    nucleus) and respects max_new_tokens."""
    eng = make_engine()
    outs = run_all(eng, prompts(seed=9), temperature=0.9, top_p=0.9)
    assert all(len(o) == 8 for o in outs)
