"""Weight-only INT8 quantization (W8A16, `ops/wquant.py`).

Invariant chain:
1. op level — `mm` / `qeinsum` / `take_rows` on a QuantizedTensor equal the
   same op on the dequantized weight (scale-after-matmul commutes with the
   per-out-column contraction up to fp rounding);
2. model level — `forward_dense` on quantized params matches forward on the
   materialized-dequantized params (same numbers, different application
   order), for dense, tied-embedding, and MoE families;
3. engine level — a `weight_dtype="int8"` engine serves end-to-end and is
   token-identical to an engine given the SAME pre-quantized params
   (determinism: quantization happens once, at init); the tiered-vs-ample
   oversubscription invariant holds under quantized weights;
4. parallel level — tp-sharded quantized engine matches single-device
   quantized serving; pipeline (pp) and ring (sp) forwards on quantized
   params match the dense quantized forward;
5. persistence — orbax save/load round-trips a quantized tree.

Reference analog: the reference quantizes only the KV stream
(`/root/reference/hardware/rtl/kv_compress.v`); wquant applies the same
fixed-ratio idea to the weight stream, which on TPU decode is the dominant
HBM traffic (NOTES_ROUND4.md utilization split).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cxl_speckv_tpu.config import (
    CacheConfig,
    EngineConfig,
    KVDtype,
    PrefetchConfig,
    ParallelConfig,
    SystemConfig,
)
from cxl_speckv_tpu.engine.engine import Engine
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import forward_dense, init_params
from cxl_speckv_tpu.ops.wquant import (
    QuantizedTensor,
    is_quantized,
    mm,
    qeinsum,
    quantize_tensor,
    quantize_weights,
    take_rows,
)

CFG = tiny_test_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))


def dequantize_tree(params):
    """Materialize every QuantizedTensor back to f32 arrays."""
    return jax.tree.map(
        lambda x: x.dequantize() if isinstance(x, QuantizedTensor) else x,
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor))


# ---------------------------------------------------------------------------
# op level
# ---------------------------------------------------------------------------

def test_mm_matches_dequantized():
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 48))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 32))
    qt = quantize_tensor(w, axis=-2)
    want = x @ qt.dequantize()
    got = mm(x, qt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mm_quantization_error_bounded():
    # per-out-column symmetric int8: relative error of the matmul result
    # stays well under 1% for gaussian weights
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64))
    got = np.asarray(mm(x, quantize_tensor(w)))
    want = np.asarray(x @ w)
    rel = np.abs(got - want).max() / np.abs(want).std()
    assert rel < 0.05, rel


def test_mm_leading_batch_weight():
    # stacked [L, in, out] weights (scan xs layout)
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 16, 24))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 16))
    qt = quantize_tensor(w, axis=-2)
    assert qt.s.shape == (3, 1, 24)
    want = jnp.einsum("lti,lio->lto", x, qt.dequantize())
    got = mm(x, qt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_qeinsum_expert_contractions():
    E, C, H, I = 3, 4, 16, 24
    xe = jax.random.normal(jax.random.PRNGKey(0), (E, C, H))
    w = jax.random.normal(jax.random.PRNGKey(1), (E, H, I))
    qt = quantize_tensor(w, axis=-2)
    want = jnp.einsum("ech,ehi->eci", xe, qt.dequantize())
    got = qeinsum("ech,ehi->eci", xe, qt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # and the down-projection direction
    h = jax.random.normal(jax.random.PRNGKey(2), (E, C, I))
    wd = quantize_tensor(jax.random.normal(jax.random.PRNGKey(3), (E, I, H)),
                         axis=-2)
    want = jnp.einsum("eci,eih->ech", h, wd.dequantize())
    got = qeinsum("eci,eih->ech", h, wd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_take_rows_and_tied_head_transpose():
    embed = jax.random.normal(jax.random.PRNGKey(0), (64, 16))
    qt = quantize_tensor(embed, axis=-1)  # per-row
    ids = jnp.asarray([[3, 9], [60, 0]])
    want = qt.dequantize()[ids]
    got = take_rows(qt, ids, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # transposed, the per-row scale becomes per-out-column: one quantized
    # table serves the tied lm_head matmul
    head = qt.T
    assert head.axis == -2 and head.shape == (16, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 16))
    np.testing.assert_allclose(
        np.asarray(mm(x, head)), np.asarray(x @ qt.dequantize().T),
        rtol=1e-5, atol=1e-5)


def test_quantize_weights_idempotent_and_selective():
    q1 = quantize_weights(PARAMS)
    assert is_quantized(q1)
    q2 = quantize_weights(q1)
    assert q2["embed"] is q1["embed"]  # untouched second time
    assert isinstance(q1["layers"]["q"], QuantizedTensor)
    assert q1["layers"]["q"].q.dtype == jnp.int8
    # norms stay full precision
    assert not isinstance(q1["layers"]["attn_norm"], QuantizedTensor)
    assert not isinstance(q1["final_norm"], QuantizedTensor)


def test_mm_plain_array_passthrough():
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 8))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8))
    np.testing.assert_array_equal(np.asarray(mm(x, w)), np.asarray(x @ w))


# ---------------------------------------------------------------------------
# model level: quantized-weights forward == dequantized-weights forward
# ---------------------------------------------------------------------------

def _forward_pair(cfg, params):
    qparams = jax.jit(quantize_weights)(params)
    toks = jnp.asarray(
        np.random.RandomState(0).randint(1, cfg.vocab_size, (2, 12)),
        jnp.int32)
    got = forward_dense(qparams, cfg, toks)
    want = forward_dense(dequantize_tree(qparams), cfg, toks)
    return np.asarray(got), np.asarray(want)


def test_forward_dense_matches_dequantized():
    got, want = _forward_pair(CFG, PARAMS)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_forward_tied_embeddings():
    cfg = dataclasses.replace(tiny_test_config(), tie_embeddings=True)
    params = init_params(cfg, jax.random.PRNGKey(7))
    got, want = _forward_pair(cfg, params)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_forward_moe():
    cfg = dataclasses.replace(tiny_test_config(), num_experts=4,
                              num_experts_per_tok=2)
    params = init_params(cfg, jax.random.PRNGKey(3))
    qparams = quantize_weights(params)
    # router must stay full precision (top-k tie exactness)
    assert not isinstance(qparams["layers"]["router"], QuantizedTensor)
    got, want = _forward_pair(cfg, params)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# engine level
# ---------------------------------------------------------------------------

def _sys(hbm=256, host=256, batch=4, wq="int8", dp=1, tp=1):
    return SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=batch, max_seq_len=128,
                            prefill_chunk=32, decode_horizon=2,
                            weight_dtype=wq),
        parallel=ParallelConfig(dp=dp, tp=tp),
    )


def _prompts(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(1, CFG.vocab_size, rng.randint(6, 24)).tolist()
            for _ in range(n)]


def _run_all(eng, ps, n=8):
    ids = [eng.add_request(p, max_new_tokens=n) for p in ps]
    outs = {o.req_id: o for o in eng.run()}
    return [outs[i].tokens for i in ids]


def test_engine_weight_dtype_serves_and_is_deterministic():
    ps = _prompts(5)
    a = _run_all(Engine(CFG, _sys(), params=PARAMS, use_pallas=False,
                        enable_lstm=False), ps)
    # same pre-quantized params passed explicitly: identical tokens
    pre = jax.jit(quantize_weights)(PARAMS)
    b = _run_all(Engine(CFG, _sys(wq="native"), params=pre, use_pallas=False,
                        enable_lstm=False), ps)
    assert a == b
    assert all(len(t) == 8 for t in a)


def test_engine_oversubscription_invariant_quantized():
    # tiering stays correctness-invisible under quantized weights
    ps = _prompts(6, seed=1)
    ample = _run_all(Engine(CFG, _sys(hbm=256), params=PARAMS,
                            use_pallas=False, enable_lstm=False), ps)
    tight = _run_all(Engine(CFG, _sys(hbm=10, host=128), params=PARAMS,
                            use_pallas=False, enable_lstm=False), ps)
    assert ample == tight


def test_engine_invalid_weight_dtype_rejected():
    with pytest.raises(ValueError, match="weight_dtype"):
        EngineConfig(weight_dtype="int3")


# ---------------------------------------------------------------------------
# parallel level
# ---------------------------------------------------------------------------

@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_tp_sharded_quantized_engine_matches_single():
    ps = _prompts(4, seed=2)
    single = _run_all(Engine(CFG, _sys(), params=PARAMS, use_pallas=False,
                             enable_lstm=False), ps)
    sharded = _run_all(Engine(CFG, _sys(dp=2, tp=2), params=PARAMS,
                              use_pallas=False, enable_lstm=False), ps)
    assert single == sharded


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_pipeline_and_ring_quantized_match_dense():
    from jax.sharding import Mesh
    from cxl_speckv_tpu.parallel.pipeline import pipeline_forward
    from cxl_speckv_tpu.parallel.ring import sp_forward_dense

    qparams = jax.jit(quantize_weights)(PARAMS)
    toks = jnp.asarray(
        np.random.RandomState(5).randint(1, CFG.vocab_size, (4, 32)),
        jnp.int32)
    want = np.asarray(forward_dense(qparams, CFG, toks))
    pp_mesh = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
    got = pipeline_forward(qparams, CFG, toks, mesh=pp_mesh,
                           num_microbatches=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)
    sp_mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    got = sp_forward_dense(qparams, CFG, toks, mesh=sp_mesh)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# W4A16 (int4 weights; embedding stays int8 — gathered, not streamed)
# ---------------------------------------------------------------------------

def test_int4_mm_matches_dequantized():
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 48))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 32))
    qt = quantize_tensor(w, axis=-2, bits=4)
    assert qt.q.dtype == jnp.int4
    got = mm(x, qt)
    want = x @ qt.dequantize()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # 4-bit per-channel error bound: looser than int8 but bounded
    rel = np.abs(np.asarray(got) - np.asarray(x @ w)).max() / \
        np.abs(np.asarray(x @ w)).std()
    assert rel < 0.6, rel


def test_int4_selective_and_forward():
    qparams = quantize_weights(PARAMS, bits=4)
    assert qparams["layers"]["q"].q.dtype == jnp.int4
    assert qparams["embed"].q.dtype == jnp.int8  # gathered, stays int8
    toks = jnp.asarray(
        np.random.RandomState(0).randint(1, CFG.vocab_size, (2, 12)),
        jnp.int32)
    got = forward_dense(qparams, CFG, toks)
    want = forward_dense(dequantize_tree(qparams), CFG, toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_spec_ngram_greedy_identity_under_wq():
    # greedy speculative == plain greedy holds with quantized weights
    # (draft-free n-gram proposer; the verify program runs the W8A16 model)
    ps = [p * 3 for p in _prompts(3, seed=5)]  # repetition gives ngram hits
    plain = _run_all(Engine(CFG, _sys(), params=PARAMS, use_pallas=False,
                            enable_lstm=False), ps)
    spec = _run_all(Engine(CFG, _sys(), params=PARAMS, use_pallas=False,
                           enable_lstm=False, spec_ngram=True), ps)
    assert plain == spec


def test_spec_draft_quantized_with_target():
    # a draft-model spec engine under weight_dtype="int8" quantizes BOTH
    # models and stays token-identical to plain greedy
    draft_cfg = dataclasses.replace(tiny_test_config(), num_layers=1)
    ps = _prompts(3, seed=6)
    plain = _run_all(Engine(CFG, _sys(), params=PARAMS, use_pallas=False,
                            enable_lstm=False), ps)
    eng = Engine(CFG, _sys(), params=PARAMS, use_pallas=False,
                 enable_lstm=False, draft_config=draft_cfg, spec_gamma=3)
    assert is_quantized(eng.spec.params)
    assert plain == _run_all(eng, ps)


def test_engine_int4_serves_and_is_deterministic():
    ps = _prompts(4, seed=3)
    a = _run_all(Engine(CFG, _sys(wq="int4"), params=PARAMS, use_pallas=False,
                        enable_lstm=False), ps)
    pre = jax.jit(lambda p: quantize_weights(p, bits=4))(PARAMS)
    b = _run_all(Engine(CFG, _sys(wq="native"), params=pre, use_pallas=False,
                        enable_lstm=False), ps)
    assert a == b
    assert all(len(t) == 8 for t in a)


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------

def test_checkpoint_roundtrip_quantized(tmp_path):
    from cxl_speckv_tpu.models.checkpoint import load_params, save_params

    qparams = quantize_weights(PARAMS)
    save_params(qparams, str(tmp_path / "ckpt"))
    back = load_params(str(tmp_path / "ckpt"), like=qparams)
    assert is_quantized(back)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        qparams, back)


# ---------------------------------------------------------------------------
# memory-safe quantized init (the 8B-scale path, r5)
# ---------------------------------------------------------------------------

def test_init_params_quantized_structure_and_serving():
    """`init_params_quantized` (models/llama.py): per-layer lax.map init
    straight into QuantizedTensor storage — the tree structure matches
    quantize_weights(init_params(...)) exactly, and an engine serves from
    it without re-quantizing (the full-precision tree never exists; this is
    how the 8B bench fits 16 GB of bf16-equivalent weights into v5e HBM)."""
    from cxl_speckv_tpu.models.llama import init_params_quantized

    cfg = dataclasses.replace(tiny_test_config(), attn_bias=True,
                              qk_norm=True, tie_embeddings=False)
    p = init_params_quantized(cfg, jax.random.PRNGKey(0))
    assert is_quantized(p)
    ref = jax.jit(lambda q: quantize_weights(q))(
        init_params(cfg, jax.random.PRNGKey(0)))
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(ref))
    # scale axes line up with the stacked-layer layout
    assert p["layers"]["gate"].axis == -2
    assert p["layers"]["gate"].s.shape == ref["layers"]["gate"].s.shape
    assert p["embed"].axis == -1
    # engine serves deterministically from the pre-quantized tree
    eng = Engine(cfg, _sys(), params=p, use_pallas=False, enable_lstm=False)
    assert eng.params is p or is_quantized(eng.params)
    outs = _run_all(eng, _prompts(3, seed=9))
    assert all(len(t) == 8 for t in outs)
    # MoE trees stay on the conversion-time path
    moe = dataclasses.replace(tiny_test_config(), num_experts=2)
    with pytest.raises(NotImplementedError):
        init_params_quantized(moe, jax.random.PRNGKey(0))


def test_quantize_weights_rejects_unclassified_layer_key():
    p = init_params(CFG, jax.random.PRNGKey(0))
    p["layers"]["mystery"] = jnp.zeros((CFG.num_layers, 8, 8))
    with pytest.raises(ValueError, match="unclassified"):
        quantize_weights(p)
