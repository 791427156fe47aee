"""Speculative decoding tests.

The decisive invariant: greedy speculative decoding emits EXACTLY the same
tokens as plain greedy decoding — the draft model only affects speed, never
output. Verified end-to-end through the engine, including under KV
oversubscription (spec + tiering together).
"""

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
from cxl_speckv_tpu.models.configs import LlamaConfig, tiny_test_config
from cxl_speckv_tpu.models.llama import (
    forward_dense,
    init_params,
    verify_step,
)
from cxl_speckv_tpu.ops.quant import kv_storage_dtype

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))
DRAFT_CFG = LlamaConfig(
    vocab_size=CFG.vocab_size, hidden_size=32, intermediate_size=64,
    num_layers=1, num_q_heads=2, num_kv_heads=2, head_dim=16,
    rope_theta=10000.0, tie_embeddings=False, max_seq_len=512,
    eos_token_id=0, dtype="float32",
)
DRAFT_PARAMS = init_params(DRAFT_CFG, jax.random.PRNGKey(7))


def make_engine(spec=False, hbm_blocks=256, gamma=3, seed=0):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm_blocks,
                          num_host_blocks=256, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=128, prefill_chunk=32),
    )
    kw = {}
    if spec:
        kw = dict(draft_config=DRAFT_CFG, draft_params=DRAFT_PARAMS,
                  spec_gamma=gamma)
    return Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False,
                  seed=seed, **kw)


def prompts(n, rng_seed=0):
    rng = np.random.RandomState(rng_seed)
    return [rng.randint(1, CFG.vocab_size, rng.randint(5, 18)).tolist()
            for _ in range(n)]


def test_verify_step_matches_dense():
    """verify_step logits over the paged cache match forward_dense rows."""
    # simpler: run via BF16 pools for losslessness
    bs, slots, mb = 8, 32, 8
    kv_dtype = KVDtype.BF16
    pack = 1
    kt_shape = (CFG.num_layers, slots, CFG.head_dim // pack,
                CFG.num_kv_heads * bs)
    shape = (CFG.num_layers, slots, CFG.num_kv_heads, bs, CFG.head_dim // pack)
    kp = jnp.zeros(kt_shape, kv_storage_dtype(kv_dtype))
    vp = jnp.zeros(shape, kv_storage_dtype(kv_dtype))
    sc = jnp.ones((CFG.num_layers, slots, 1,
                   CFG.num_kv_heads * bs), jnp.float32)
    vs = jnp.ones_like(sc)
    from cxl_speckv_tpu.models.llama import prefill_chunk

    tokens = jax.random.randint(jax.random.PRNGKey(5), (20,), 1, CFG.vocab_size)
    table = jnp.arange(1, mb + 1, dtype=jnp.int32)
    # prefill the first 12 tokens
    _, kp, vp, sc, vs = prefill_chunk(PARAMS, CFG, kv_dtype, tokens[:12],
                                      jnp.int32(0), kp, vp, sc, vs, table)
    # verify chunk: tokens 12..19 (T=8), start_pos=12
    logits, *_ = verify_step(
        PARAMS, CFG, kv_dtype, tokens[None, 12:], jnp.array([12], jnp.int32),
        kp, vp, sc, vs, table[None], jnp.array([True]))
    want = np.asarray(forward_dense(PARAMS, CFG, tokens[None])[0])[12:]
    np.testing.assert_allclose(np.asarray(logits[0]), want, rtol=3e-2, atol=3e-2)
    assert (np.asarray(logits[0]).argmax(-1) == want.argmax(-1)).all()


def test_spec_matches_plain_greedy():
    ps = prompts(6, rng_seed=1)
    plain = make_engine(spec=False)
    for p in ps:
        plain.add_request(p, max_new_tokens=10)
    want = {o.req_id: o.tokens for o in plain.run()}

    spec = make_engine(spec=True, gamma=3)
    for p in ps:
        spec.add_request(p, max_new_tokens=10)
    got = {o.req_id: o.tokens for o in spec.run()}

    assert want.keys() == got.keys()
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged under spec decode"
    st = spec.get_statistics()
    assert st["spec"]["rounds"] > 0
    assert st["spec"]["tokens_per_round"] >= 1.0


def test_spec_with_oversubscription():
    ps = prompts(6, rng_seed=2)
    plain = make_engine(spec=False, hbm_blocks=256)
    for p in ps:
        plain.add_request(p, max_new_tokens=8)
    want = {o.req_id: o.tokens for o in plain.run()}

    tight = make_engine(spec=True, hbm_blocks=14, gamma=3)
    for p in ps:
        tight.add_request(p, max_new_tokens=8)
    got = {o.req_id: o.tokens for o in tight.run()}
    for rid in want:
        assert got[rid] == want[rid], f"request {rid} diverged (spec+tiering)"
    st = tight.get_statistics()
    assert st["transfer"]["up_transfers"] > 0


def test_spec_self_draft_accepts_everything():
    """Draft == target with identical (BF16) caches: every draft token must
    be accepted, so each round emits gamma+1 tokens."""
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=256,
                          num_host_blocks=256, kv_dtype=KVDtype.BF16),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=128, prefill_chunk=32),
    )
    eng2 = Engine(CFG, sc, params=PARAMS, use_pallas=False, enable_lstm=False,
                  draft_config=CFG, draft_params=PARAMS, spec_gamma=3)
    p = prompts(1, rng_seed=3)[0]
    eng2.add_request(p, max_new_tokens=9)
    outs = eng2.run()
    st = eng2.get_statistics()["spec"]
    assert outs[0].tokens is not None
    assert st["acceptance_rate"] == 1.0, st
    assert st["tokens_per_round"] == 4.0, st


def test_spec_at_table_capacity():
    """A request whose prompt + max_new_tokens hits max_seq_len exactly must
    finish cleanly under spec decoding: the verify-extend target is clamped
    to table capacity (a lane within gamma of the cap writes fewer
    speculative rows; overshoot past its final length is never read)."""
    eng = make_engine(spec=True, gamma=3)
    max_len = eng.config.engine.max_seq_len
    prompt = list(np.random.RandomState(3).randint(1, CFG.vocab_size, 16))
    prompt = [int(t) for t in prompt]
    rid = eng.add_request(prompt, max_new_tokens=max_len - len(prompt))
    outs = eng.run()
    assert len(outs) == 1 and outs[0].req_id == rid
    assert outs[0].finish_reason in ("length", "eos")

    plain = make_engine(spec=False)
    plain.add_request(prompt, max_new_tokens=max_len - len(prompt))
    pouts = plain.run()
    assert outs[0].tokens == pouts[0].tokens


def test_accept_program_sampled_distribution():
    """The speculative-sampling acceptance rule must emit tokens with the
    TARGET distribution: over many lanes sharing one (p, q) pair, the first
    emitted token's empirical distribution matches softmax(target/T)."""
    from cxl_speckv_tpu.engine.spec import _accept_program

    V, gamma, B = 8, 2, 20000
    rng = jax.random.PRNGKey(3)
    k_t, k_d, k_s, k_a = jax.random.split(rng, 4)
    t_log = jax.random.normal(k_t, (V,)) * 1.5
    d_log = jax.random.normal(k_d, (V,)) * 1.5
    temps = jnp.full((B,), 1.0)
    target_logits = jnp.broadcast_to(t_log, (B, gamma + 1, V))
    draft_logits = jnp.broadcast_to(d_log, (B, gamma, V))
    # drafts sampled from q per lane (the proposal distribution)
    drafts = jax.random.categorical(
        k_s, jnp.broadcast_to(d_log, (B, gamma, V)), axis=-1).astype(jnp.int32)
    n_acc, final = _accept_program(target_logits, draft_logits, drafts,
                                   temps, jnp.zeros(B), k_a, gamma=gamma)
    n_acc, final, drafts = map(np.asarray, (n_acc, final, drafts))
    first = np.where(n_acc > 0, drafts[:, 0], final)
    emp = np.bincount(first, minlength=V) / B
    want = np.asarray(jax.nn.softmax(t_log))
    tv = 0.5 * np.abs(emp - want).sum()
    assert tv < 0.02, (tv, emp, want)


def test_accept_program_greedy_matches_host_rule():
    """temperature<=0 lanes through the in-graph accept reproduce the host
    greedy loop exactly (mixed with sampled lanes in one batch)."""
    from cxl_speckv_tpu.engine.spec import _accept_program

    V, gamma, B = 16, 3, 64
    rng = np.random.RandomState(0)
    target_logits = rng.randn(B, gamma + 1, V).astype(np.float32)
    draft_logits = rng.randn(B, gamma, V).astype(np.float32)
    drafts = rng.randint(0, V, (B, gamma)).astype(np.int32)
    temps = np.zeros(B, np.float32)
    n_acc, final = _accept_program(
        jnp.asarray(target_logits), jnp.asarray(draft_logits),
        jnp.asarray(drafts), jnp.asarray(temps), jnp.zeros(B),
        jnp.asarray(np.array([1, 2], np.uint32)), gamma=gamma)
    n_acc, final = np.asarray(n_acc), np.asarray(final)
    preds = target_logits.argmax(-1)
    for b in range(B):
        j = 0
        while j < gamma and preds[b, j] == drafts[b, j]:
            j += 1
        assert n_acc[b] == j
        assert final[b] == preds[b, j]


def test_spec_sampled_runs_and_finishes():
    """Sampled speculative decoding (temperature > 0): requests complete,
    deterministic given the seed, and acceptance statistics accumulate."""
    ps = prompts(4, rng_seed=5)
    outs1 = None
    for _ in range(2):
        eng = make_engine(spec=True, seed=11)
        for p in ps:
            eng.add_request(p, max_new_tokens=12, temperature=0.9)
        outs = {o.req_id: o.tokens for o in eng.run()}
        assert all(1 <= len(t) <= 12 for t in outs.values())
        if outs1 is None:
            outs1 = outs
        else:
            assert outs == outs1  # same seed -> same samples
    st = eng.get_statistics()["spec"]
    assert st["rounds"] > 0 and st["drafted"] > 0
