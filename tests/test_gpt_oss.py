"""GPT-OSS family: learned attention sinks, clamped-activation MoE with
biased projections, fully-biased attention, YaRN rope, alternating
sliding/full attention.

The sink is one extra per-head logit in every softmax denominator (an
always-available "null" token with no value vector) — plumbed through the
jnp reference paths, both Pallas kernels (finalize-time merge into the
online-softmax accumulators), the streamed host-context path, and the
pp/sp parallel forwards. HF `GptOssForCausalLM` logit parity pins the
whole convention set at once.
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
    SystemConfig,
)
from cxl_speckv_tpu.engine.engine import Engine
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import forward_dense, init_params


def tiny_gpt_oss_config(**kw):
    base = dict(
        attn_sinks=True, o_bias=True, attn_bias=True,
        num_experts=4, num_experts_per_tok=2, moe_style="gpt_oss",
        sliding_window=6, attn_pattern=(True, False),
    )
    base.update(kw)
    return dataclasses.replace(tiny_test_config(), **base)


# ---------------------------------------------------------------------------
# HF logit parity (sinks + clamped MoE + biases + yarn + window, all binding)
# ---------------------------------------------------------------------------

def test_hf_parity_gpt_oss():
    torch = pytest.importorskip("torch")
    from transformers import GptOssConfig, GptOssForCausalLM

    from cxl_speckv_tpu.models.hf_convert import (
        config_from_hf,
        params_from_hf_state_dict,
    )

    hf_cfg = GptOssConfig(
        vocab_size=64, hidden_size=32, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, max_position_embeddings=64,
        sliding_window=6, num_local_experts=4, num_experts_per_tok=2,
        rope_scaling={"rope_type": "yarn", "factor": 2.0,
                      "original_max_position_embeddings": 32,
                      "beta_fast": 32, "beta_slow": 1},
        attn_implementation="eager", pad_token_id=0,
    )
    torch.manual_seed(0)
    hf_model = GptOssForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.attn_sinks and cfg.o_bias and cfg.attn_bias
    assert cfg.moe_style == "gpt_oss" and cfg.num_experts == 4
    assert cfg.rope_yarn is not None and cfg.rope_yarn.factor == 2.0
    assert True in cfg.attn_pattern and False in cfg.attn_pattern
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       dtype=jnp.float32)
    tokens = np.array([3, 17, 9, 25, 1, 4, 4, 7, 19, 2, 11, 30, 5, 8, 21, 13],
                      dtype=np.int64)   # seq 16 > window 6: sliding binds
    with torch.no_grad():
        want = hf_model(torch.tensor(tokens[None])).logits[0].float().numpy()
    got = np.asarray(forward_dense(params, cfg, jnp.asarray(tokens)[None])[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# kernel level: sinks through both Pallas kernels (interpreter mode on CPU)
# ---------------------------------------------------------------------------

def _pools(cfg, kv_dtype, slots=16, seed=0):
    from cxl_speckv_tpu.ops.quant import kv_storage_dtype, quantize_kv

    bs = 8
    rng = jax.random.PRNGKey(seed)
    k_raw = jax.random.normal(rng, (slots, cfg.num_kv_heads, bs, cfg.head_dim))
    v_raw = jax.random.normal(jax.random.split(rng)[0],
                              (slots, cfg.num_kv_heads, bs, cfg.head_dim))
    kq, ks = quantize_kv(k_raw, kv_dtype)
    vq, vs = quantize_kv(v_raw, kv_dtype)
    from cxl_speckv_tpu.ops.paged_attention import store_to_kt
    from cxl_speckv_tpu.ops.quant import encode_for_pool
    kp = store_to_kt(encode_for_pool(kq, kv_dtype).astype(
        kv_storage_dtype(kv_dtype)))
    vp = encode_for_pool(vq, kv_dtype).astype(kv_storage_dtype(kv_dtype))
    # flat kT-order scale pools [S, 1, Hkv*bs]
    flat_sc = lambda s: s[..., 0].reshape(slots, 1, -1)
    return kp, vp, flat_sc(ks), flat_sc(vs), bs


@pytest.mark.parametrize("dt", [KVDtype.INT8, KVDtype.BF16])
def test_decode_kernel_sinks_matches_ref(dt):
    from cxl_speckv_tpu.ops.paged_attention import paged_attention
    from cxl_speckv_tpu.ops.paged_attention_ref import paged_attention_ref

    cfg = tiny_gpt_oss_config()
    kp, vp, ks, vs, bs = _pools(cfg, dt)
    B, mb = 3, 4
    table = jnp.asarray(
        np.random.RandomState(0).choice(15, (B, mb), replace=False) + 1,
        jnp.int32)
    lens = jnp.asarray([5, 17, 31], jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(7),
                          (B, cfg.num_q_heads, cfg.head_dim))
    sinks = jax.random.normal(jax.random.PRNGKey(8),
                              (cfg.num_q_heads,)) * 2.0
    want = paged_attention_ref(q, kp, vp, ks, vs, table, lens, dt,
                               sinks=sinks)
    got = paged_attention(q, kp, vp, ks, vs, table, lens, dt,
                          interpret=True, sinks=sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    # and the sink must actually matter
    plain = paged_attention_ref(q, kp, vp, ks, vs, table, lens, dt)
    assert not np.allclose(np.asarray(want), np.asarray(plain), atol=1e-3)


@pytest.mark.parametrize("dt", [KVDtype.INT8, KVDtype.BF16])
def test_chunk_kernel_sinks_matches_ref(dt):
    from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention
    from cxl_speckv_tpu.ops.chunk_attention_pallas import (
        paged_chunk_attention_pallas)

    cfg = tiny_gpt_oss_config()
    kp, vp, ks, vs, bs = _pools(cfg, dt, seed=3)
    B, T, mb = 2, 8, 4
    table = jnp.asarray(
        np.random.RandomState(1).choice(15, (B, mb), replace=False) + 1,
        jnp.int32)
    start = jnp.asarray([9, 26], jnp.int32)
    rng = jax.random.PRNGKey(9)
    q = jax.random.normal(rng, (B, T, cfg.num_q_heads, cfg.head_dim))
    kn = jax.random.normal(jax.random.split(rng)[0],
                           (B, T, cfg.num_kv_heads, cfg.head_dim))
    vn = jax.random.normal(jax.random.split(rng)[1],
                           (B, T, cfg.num_kv_heads, cfg.head_dim))
    sinks = jax.random.normal(jax.random.PRNGKey(10),
                              (cfg.num_q_heads,)) * 2.0
    want = paged_chunk_attention(q, kn, vn, kp, vp, ks, vs, table, start,
                                 dt, sinks=sinks)
    got = paged_chunk_attention_pallas(q, kn, vn, kp, vp, ks, vs, table,
                                       start, dt, interpret=True,
                                       sinks=sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# engine level: full serving path
# ---------------------------------------------------------------------------

def _engine(cfg, params, *, hbm=48, host=64, pallas=False):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=KVDtype.BF16),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=2, max_seq_len=96,
                            prefill_chunk=16, decode_horizon=2))
    return Engine(cfg, sc, params=params, use_pallas=pallas,
                  enable_lstm=False)


@pytest.mark.parametrize("pallas", [False, True])
def test_gpt_oss_engine_matches_dense_greedy(pallas):
    """Sinks + clamped MoE + biases through the full paged serving path
    (jnp reference AND Pallas-kernel attention): generation continues the
    dense forward's greedy continuation exactly."""
    cfg = tiny_gpt_oss_config()
    params = init_params(cfg, jax.random.PRNGKey(4))
    prompt = list(np.random.RandomState(3).randint(1, 256, 13))
    gen = 10

    toks = list(prompt)
    for _ in range(gen):
        logits = forward_dense(params, cfg, jnp.asarray(toks)[None])
        toks.append(int(jnp.argmax(logits[0, -1])))
    want = toks[len(prompt):]

    eng = _engine(cfg, params, pallas=pallas)
    rid = eng.add_request([int(t) for t in prompt], max_new_tokens=gen)
    outs = {o.req_id: o.tokens for o in eng.run()}
    assert outs[rid] == want


def test_gpt_oss_engine_ep_tp_mesh_matches_single_device():
    """All the GPT-OSS param leaves (sinks, o_bias, expert/router biases,
    q/k/v biases) have mesh shardings: an ep=2 x tp=2 engine serves
    token-identically to single-device."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from cxl_speckv_tpu.config import ParallelConfig

    cfg = tiny_gpt_oss_config()
    params = init_params(cfg, jax.random.PRNGKey(8))
    rng = np.random.RandomState(9)
    ps = [rng.randint(1, 256, rng.randint(8, 16)).tolist() for _ in range(3)]

    def build(**par):
        sc = SystemConfig(
            cache=CacheConfig(block_size=8, num_hbm_blocks=48,
                              num_host_blocks=64, kv_dtype=KVDtype.BF16),
            prefetch=PrefetchConfig(enabled=True, depth=2),
            engine=EngineConfig(max_batch_size=2, max_seq_len=96,
                                prefill_chunk=16, decode_horizon=2),
            parallel=ParallelConfig(**par) if par else ParallelConfig())
        return Engine(cfg, sc, params=params, use_pallas=False,
                      enable_lstm=False)

    def run(eng):
        ids = [eng.add_request(p, max_new_tokens=8) for p in ps]
        outs = {o.req_id: o.tokens for o in eng.run()}
        return [outs[i] for i in ids]

    ref = run(build())
    got = run(build(ep=2, tp=2))
    assert got == ref


def test_gpt_oss_pp_sp_match_dense():
    """Sinks flow through the pipeline and ring-attention forwards too."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh

    from cxl_speckv_tpu.parallel.pipeline import pipeline_forward
    from cxl_speckv_tpu.parallel.ring import sp_forward_dense

    # 4 layers: each pp=2 stage holds one full (sliding, global) period
    cfg = tiny_gpt_oss_config(num_layers=4)
    params = init_params(cfg, jax.random.PRNGKey(12))
    toks = jnp.asarray(np.random.RandomState(13).randint(1, 256, (2, 16)))
    want = forward_dense(params, cfg, toks)
    pp_mesh = Mesh(np.array(jax.devices()[:2]), ("pp",))
    got_pp = pipeline_forward(params, cfg, toks, mesh=pp_mesh,
                              num_microbatches=2)
    np.testing.assert_allclose(np.asarray(got_pp), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    sp_mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    got_sp = sp_forward_dense(params, cfg, toks, mesh=sp_mesh)
    np.testing.assert_allclose(np.asarray(got_sp), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_gpt_oss_engine_tiered_matches_ample():
    cfg = tiny_gpt_oss_config()
    params = init_params(cfg, jax.random.PRNGKey(5))
    rng = np.random.RandomState(6)
    ps = [rng.randint(1, 256, rng.randint(8, 20)).tolist() for _ in range(4)]

    def run(eng):
        ids = [eng.add_request(p, max_new_tokens=8) for p in ps]
        outs = {o.req_id: o.tokens for o in eng.run()}
        return [outs[i] for i in ids]

    ref = run(_engine(cfg, params, hbm=64, host=0))
    got = run(_engine(cfg, params, hbm=12, host=64))
    assert got == ref
