"""Mixtral-family sparse-MoE model: router/expert math, HF parity, paged
serving, and expert-parallel (ep) mesh serving.

Invariant chain (mirrors the other family tests):
1. the two MoE compute modes ("dense" weighted-combine, "dispatch"
   capacity-bucketed) are numerically identical when capacity covers all
   routed tokens;
2. `forward_dense` matches HF `MixtralForCausalLM` logits on the same
   random weights (router softmax->top-k->renormalize conventions);
3. engine serving over the paged tiered cache matches the ample engine
   token-for-token, and an ep x tp sharded engine matches single-device.
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
    ParallelConfig,
    PrefetchConfig,
    SystemConfig,
)
from cxl_speckv_tpu.engine.engine import Engine
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import forward_dense, init_params
from cxl_speckv_tpu.models.moe import moe_ffn, router_combine_weights


def tiny_moe_config(**kw):
    kw = {"num_experts": 4, "num_experts_per_tok": 2, **kw}
    return dataclasses.replace(tiny_test_config(), **kw)


CFG = tiny_moe_config()
PARAMS = init_params(CFG, jax.random.PRNGKey(42))


# ---------------------------------------------------------------------------
# op level: router + expert combine math
# ---------------------------------------------------------------------------

def test_router_weights_topk_renormalized():
    x = jax.random.normal(jax.random.PRNGKey(0), (6, 16))
    rw = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    cw = np.asarray(router_combine_weights(x, rw, 2))
    assert cw.shape == (6, 4)
    nz = (cw > 0).sum(axis=1)
    np.testing.assert_array_equal(nz, 2)           # exactly top-2 selected
    np.testing.assert_allclose(cw.sum(axis=1), 1.0, rtol=1e-6)


@pytest.mark.parametrize("N", [1, 5, 32])
def test_moe_dense_vs_dispatch_identical(N):
    """With capacity >= every expert's routed load, the dispatch mode must
    reproduce the dense mode bit-for-bit up to f32 summation order."""
    lp = jax.tree.map(lambda a: a[0], PARAMS["layers"])  # layer 0 slice
    x = jax.random.normal(jax.random.PRNGKey(2), (N, CFG.hidden_size))
    dense = moe_ffn(x, lp, dataclasses.replace(CFG, moe_impl="dense"))
    disp = moe_ffn(x, lp, dataclasses.replace(CFG, moe_impl="dispatch",
                                              moe_capacity_factor=float(CFG.num_experts)))
    np.testing.assert_allclose(np.asarray(disp), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_moe_dispatch_capacity_drop_semantics():
    """Overflowing tokens lose exactly the dropped expert's contribution:
    with capacity 1, each expert serves only its first-arriving token."""
    lp = jax.tree.map(lambda a: a[0], PARAMS["layers"])
    x = jnp.tile(jax.random.normal(jax.random.PRNGKey(3), (1, CFG.hidden_size)),
                 (4, 1))  # identical tokens -> identical routing
    cfg = dataclasses.replace(CFG, moe_impl="dispatch",
                              moe_capacity_factor=1e-9)  # capacity clamps to 1
    out = np.asarray(moe_ffn(x, lp, cfg))
    dense = np.asarray(moe_ffn(x, lp, dataclasses.replace(CFG)))
    # token 0 got both its experts; tokens 1-3 were fully dropped (same
    # routing as token 0, buckets already full) -> exact zeros
    np.testing.assert_allclose(out[0], dense[0], rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(out[1:], 0.0)


# ---------------------------------------------------------------------------
# model level: HF Mixtral parity
# ---------------------------------------------------------------------------

def test_hf_parity_mixtral():
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    from cxl_speckv_tpu.models.hf_convert import (
        config_from_hf,
        params_from_hf_state_dict,
    )

    hf_cfg = MixtralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        max_position_embeddings=64, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = MixtralForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       dtype=jnp.float32)
    tokens = np.array([3, 17, 9, 25, 1, 4, 4, 7, 19, 2, 11, 30, 5, 8, 21, 13],
                      dtype=np.int64)
    with torch.no_grad():
        want = hf_model(torch.tensor(tokens[None])).logits[0].float().numpy()
    for impl in ("dense", "dispatch"):
        icfg = dataclasses.replace(
            cfg, moe_impl=impl,
            moe_capacity_factor=float(cfg.num_experts))
        got = np.asarray(forward_dense(params, icfg, jnp.asarray(tokens)[None])[0])
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_hf_parity_qwen2_moe_shared_expert():
    """Qwen2-MoE: raw (un-renormalized) top-k probabilities + the
    sigmoid-gated shared expert + QKV bias, all binding."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    from cxl_speckv_tpu.models.hf_convert import (
        config_from_hf,
        params_from_hf_state_dict,
    )

    hf_cfg = Qwen2MoeConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=24, shared_expert_intermediate_size=40,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[], rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        max_position_embeddings=64, use_sliding_window=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = Qwen2MoeForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.num_experts == 4 and not cfg.moe_norm_topk
    assert cfg.moe_shared_expert == 40 and cfg.attn_bias
    assert cfg.intermediate_size == 24   # per-expert width
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       dtype=jnp.float32)
    tokens = np.array([3, 17, 9, 25, 1, 4, 4, 7, 19, 2, 11, 30, 5, 8, 21, 13],
                      dtype=np.int64)
    with torch.no_grad():
        want = hf_model(torch.tensor(tokens[None])).logits[0].float().numpy()
    got = np.asarray(forward_dense(params, cfg, jnp.asarray(tokens)[None])[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_hf_parity_qwen3_moe():
    """Qwen3-MoE: renormalized top-k + per-head qk-norm, no shared expert."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    from cxl_speckv_tpu.models.hf_convert import (
        config_from_hf,
        params_from_hf_state_dict,
    )

    hf_cfg = Qwen3MoeConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=24, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[], rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        max_position_embeddings=64, use_sliding_window=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = Qwen3MoeForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.qk_norm and cfg.moe_norm_topk and cfg.moe_shared_expert == 0
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       dtype=jnp.float32)
    tokens = np.array([3, 17, 9, 25, 1, 4, 4, 7, 19, 2, 11, 30, 5, 8, 21, 13],
                      dtype=np.int64)
    with torch.no_grad():
        want = hf_model(torch.tensor(tokens[None])).logits[0].float().numpy()
    got = np.asarray(forward_dense(params, cfg, jnp.asarray(tokens)[None])[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_qwen2_moe_engine_matches_dense_greedy():
    """Shared expert + raw top-k through the paged serving path."""
    cfg = tiny_moe_config(moe_norm_topk=False, moe_shared_expert=48,
                          attn_bias=True)
    params = init_params(cfg, jax.random.PRNGKey(7))
    prompt = list(np.random.RandomState(8).randint(1, 256, 12))
    gen = 8
    toks = list(prompt)
    for _ in range(gen):
        logits = forward_dense(params, cfg, jnp.asarray(toks)[None])
        toks.append(int(jnp.argmax(logits[0, -1])))
    want = toks[len(prompt):]
    eng = _engine(cfg, params)
    rid = eng.add_request([int(t) for t in prompt], max_new_tokens=gen)
    outs = {o.req_id: o.tokens for o in eng.run()}
    assert outs[rid] == want


# ---------------------------------------------------------------------------
# engine level: MoE serving over the paged tiered cache (+ ep mesh)
# ---------------------------------------------------------------------------

def _engine(cfg, params, *, hbm=48, host=64, dp=1, ep=1, tp=1, spec=False):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=96,
                            prefill_chunk=32, decode_horizon=2),
        parallel=ParallelConfig(dp=dp, ep=ep, tp=tp),
    )
    return Engine(cfg, sc, params=params, use_pallas=False,
                  enable_lstm=False, seed=0)


def _prompts(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(1, CFG.vocab_size, rng.randint(6, 20)).tolist()
            for _ in range(n)]


def _run(eng, ps, gen=10):
    ids = [eng.add_request(p, max_new_tokens=gen) for p in ps]
    outs = {o.req_id: o.tokens for o in eng.run()}
    return [outs[i] for i in ids]


def test_moe_engine_tiered_matches_ample():
    ps = _prompts(4, seed=1)
    ref = _run(_engine(CFG, PARAMS, hbm=64, host=0), ps)
    got = _run(_engine(CFG, PARAMS, hbm=12, host=64), ps)
    assert got == ref


def test_moe_engine_ep_mesh_matches_single_device():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    ps = _prompts(4, seed=2)
    ref = _run(_engine(CFG, PARAMS), ps)
    eng = _engine(CFG, PARAMS, ep=2, tp=2)
    # expert weights sharded over ep on the expert axis, tp on features
    spec = eng.params["layers"]["gate"].sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, "ep", None, "tp")
    got = _run(eng, ps)
    assert got == ref


def test_moe_ep_requires_divisibility():
    with pytest.raises(ValueError, match="num_experts"):
        _engine(tiny_moe_config(num_experts=3), None, ep=2, tp=1)
