"""Gemma-2 family: alternating local/global attention layers, tanh
softcaps (attention + final logits), GeGLU, sandwich norms, scaled
embeddings, query_pre_attn_scalar.

Invariant chain (mirrors the other family tests):
1. softcap-enabled attention ops (Pallas decode/chunk kernels) agree with
   the jnp references;
2. `forward_dense` matches HF `Gemma2ForCausalLM` logits on the same
   random weights at a sequence length where the sliding layers' window
   BINDS while global layers see everything (so the per-layer static
   window specialization in `_scan_layers` is exercised for real);
3. engine serving over the paged tiered cache is token-identical to the
   dense forward, and window retirement is disabled (global layers keep
   full KV — `retirement_window` is None).
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
from cxl_speckv_tpu.models.configs import gemma2_9b, tiny_test_config
from cxl_speckv_tpu.models.llama import forward_dense, init_params
from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention
from cxl_speckv_tpu.ops.chunk_attention_pallas import paged_chunk_attention_pallas
from cxl_speckv_tpu.ops.paged_attention import paged_attention
from cxl_speckv_tpu.ops.paged_attention_ref import paged_attention_ref

from helpers import build_pools

BLOCK = 8
HQ, HKV, D = 4, 2, 64
WINDOW = 12
CAP = 20.0


def tiny_gemma_config(**kw):
    base = dict(
        sliding_window=6, attn_pattern=(True, False), attn_softcap=30.0,
        final_softcap=10.0, norm_offset=True, post_norms=True,
        act_fn="gelu_tanh", embed_scale=True, query_scale=10.0**-0.5)
    base.update(kw)
    return dataclasses.replace(tiny_test_config(), **base)


# ---------------------------------------------------------------------------
# op level: softcap through the kernels
# ---------------------------------------------------------------------------

def _pools(kv_dtype, lens=(5, 17, 32), seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2 * len(lens) + 1)
    keys = [jax.random.normal(ks[2 * i], (L, HKV, D)) for i, L in enumerate(lens)]
    vals = [jax.random.normal(ks[2 * i + 1], (L, HKV, D)) for i, L in enumerate(lens)]
    pools = build_pools(keys, vals, BLOCK, num_slots=32, kv_dtype=kv_dtype)
    q = jax.random.normal(ks[-1], (len(lens), HQ, D))
    return q, pools


@pytest.mark.parametrize("window", [None, WINDOW])
def test_decode_pallas_softcap_matches_ref(window):
    dt = KVDtype.INT8
    q, (kp, vp, ks, vs, table, lens, _, _) = _pools(dt)
    want = paged_attention_ref(q, kp, vp, ks, vs, table, lens, dt,
                               window=window, softcap=CAP)
    got = paged_attention(q, kp, vp, ks, vs, table, lens, dt,
                          interpret=True, window=window, softcap=CAP)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # the cap must actually change the result
    plain = paged_attention_ref(q, kp, vp, ks, vs, table, lens, dt,
                                window=window)
    assert float(jnp.max(jnp.abs(want - plain))) > 1e-4


def test_chunk_pallas_softcap_matches_jnp():
    dt = KVDtype.INT8
    T, lens = 4, (11, 26)
    B = len(lens)
    kseq = jax.random.split(jax.random.PRNGKey(3), 2 * B + 3)
    keys = [jax.random.normal(kseq[2 * i], (L, HKV, D)) for i, L in enumerate(lens)]
    vals = [jax.random.normal(kseq[2 * i + 1], (L, HKV, D)) for i, L in enumerate(lens)]
    kp, vp, ks, vs, table, start, _, _ = build_pools(
        keys, vals, BLOCK, num_slots=32, kv_dtype=dt)
    q = jax.random.normal(kseq[-3], (B, T, HQ, D))
    k_new = jax.random.normal(kseq[-2], (B, T, HKV, D))
    v_new = jax.random.normal(kseq[-1], (B, T, HKV, D))
    want = paged_chunk_attention(q, k_new, v_new, kp, vp, ks, vs, table,
                                 start, dt, softcap=CAP, window=WINDOW)
    got = paged_chunk_attention_pallas(q, k_new, v_new, kp, vp, ks, vs,
                                       table, start, dt, interpret=True,
                                       softcap=CAP, window=WINDOW)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# model level: HF Gemma-2 parity (alternating windows bind)
# ---------------------------------------------------------------------------

def test_hf_parity_gemma2():
    torch = pytest.importorskip("torch")
    from transformers import Gemma2Config, Gemma2ForCausalLM

    from cxl_speckv_tpu.models.hf_convert import (
        config_from_hf,
        params_from_hf_state_dict,
    )

    hf_cfg = Gemma2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=True, max_position_embeddings=64,
        sliding_window=6, query_pre_attn_scalar=16.0,
        attn_logit_softcapping=30.0, final_logit_softcapping=10.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = Gemma2ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.attn_pattern == (True, False)   # reduced repeating period
    assert cfg.attn_softcap == 30.0 and cfg.final_softcap == 10.0
    assert cfg.norm_offset and cfg.post_norms and cfg.embed_scale
    assert cfg.act_fn == "gelu_tanh"
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       dtype=jnp.float32)
    tokens = np.array([3, 17, 9, 25, 1, 4, 4, 7, 19, 2, 11, 30, 5, 8, 21, 13],
                      dtype=np.int64)   # seq 16 > window 6: sliding binds
    with torch.no_grad():
        want = hf_model(torch.tensor(tokens[None])).logits[0].float().numpy()
    got = np.asarray(forward_dense(params, cfg, jnp.asarray(tokens)[None])[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_hf_parity_gemma3():
    """Gemma-3: per-head qk-norm in the 1+w convention replaces the Gemma-2
    softcaps, and sliding layers use their OWN RoPE base frequency
    (rope_local_base_freq) while global layers use rope_theta with linear
    scaling. The test geometry makes every convention bind: window 6 < seq
    16, local theta != global theta, linear factor 2."""
    torch = pytest.importorskip("torch")
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    from cxl_speckv_tpu.models.hf_convert import (
        config_from_hf,
        params_from_hf_state_dict,
    )

    hf_cfg = Gemma3TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=50000.0, rope_local_base_freq=10000.0,
        rope_scaling={"rope_type": "linear", "factor": 2.0},
        rms_norm_eps=1e-5, tie_word_embeddings=True,
        max_position_embeddings=64, sliding_window=6,
        sliding_window_pattern=2, query_pre_attn_scalar=16.0,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = Gemma3ForCausalLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.qk_norm and cfg.rope_local_theta == 10000.0
    assert cfg.rope_linear_factor == 2.0 and cfg.attn_softcap is None
    assert cfg.norm_offset and cfg.post_norms and cfg.embed_scale
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
# engine level: Gemma-2 serving over the paged tiered cache
# ---------------------------------------------------------------------------

def _engine(cfg, params, *, hbm=48, host=64):
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm,
                          num_host_blocks=host, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=96,
                            prefill_chunk=32, decode_horizon=2),
    )
    return Engine(cfg, sc, params=params, use_pallas=False,
                  enable_lstm=False, seed=0)


def test_gemma_engine_matches_dense_greedy():
    """Paged prefill+decode serving reproduces the dense forward's greedy
    continuation exactly (softcaps, sandwich norms, GeGLU, alternating
    windows all flowing through the cache paths)."""
    cfg = tiny_gemma_config()
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.RandomState(4)
    prompt = rng.randint(1, cfg.vocab_size, 14).tolist()
    gen = 12

    toks = list(prompt)
    for _ in range(gen):
        logits = forward_dense(params, cfg, jnp.asarray([toks]))
        toks.append(int(jnp.argmax(logits[0, -1])))
    want = toks[len(prompt):]

    eng = _engine(cfg, params)
    assert eng.scheduler.window_tokens is None   # global layers: no retire
    eng.add_request(prompt, max_new_tokens=gen)
    outs = eng.run()
    assert outs[0].tokens == want


def test_gemma3_engine_matches_dense_greedy():
    """Gemma-3 conventions through the full serving path: per-head 1+w
    qk-norm, per-layer-type RoPE bases (local theta on sliding layers,
    linearly-scaled global theta on full layers), no softcaps."""
    cfg = tiny_gemma_config(
        attn_softcap=None, final_softcap=None, qk_norm=True,
        rope_local_theta=10000.0, rope_theta=50000.0,
        rope_linear_factor=2.0)
    params = init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(6)
    prompt = rng.randint(1, cfg.vocab_size, 14).tolist()
    gen = 12

    toks = list(prompt)
    for _ in range(gen):
        logits = forward_dense(params, cfg, jnp.asarray([toks]))
        toks.append(int(jnp.argmax(logits[0, -1])))
    want = toks[len(prompt):]

    eng = _engine(cfg, params)
    eng.add_request(prompt, max_new_tokens=gen)
    outs = eng.run()
    assert outs[0].tokens == want


def test_gemma_engine_tiered_matches_ample():
    cfg = tiny_gemma_config()
    params = init_params(cfg, jax.random.PRNGKey(2))
    rng = np.random.RandomState(5)
    ps = [rng.randint(1, cfg.vocab_size, rng.randint(8, 20)).tolist()
          for _ in range(4)]

    def run(eng):
        ids = [eng.add_request(p, max_new_tokens=10) for p in ps]
        outs = {o.req_id: o.tokens for o in eng.run()}
        return [outs[i] for i in ids]

    ref = run(_engine(cfg, params, hbm=64, host=0))
    got = run(_engine(cfg, params, hbm=12, host=64))
    assert got == ref


def test_retirement_window_gating():
    assert tiny_gemma_config().retirement_window is None
    assert tiny_gemma_config(attn_pattern=(True,)).retirement_window == 6
    assert gemma2_9b().retirement_window is None
    mistral_like = dataclasses.replace(tiny_test_config(), sliding_window=64)
    assert mistral_like.retirement_window == 64
