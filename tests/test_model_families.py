"""Model-family variants: Mistral sliding-window attention + Qwen2 QKV bias.

The reference is model-agnostic (the LLM sits outside it, SURVEY.md §1), so
"model family coverage" for this framework means the architecture variants a
serving engine must host. Invariant chain:
1. window-masked op paths (ref decode, Pallas decode, jnp chunk, Pallas
   chunk) agree with a naive dense windowed reference;
2. `forward_dense` matches HF `MistralForCausalLM` / `Qwen2ForCausalLM`
   logits on the same random weights (window + bias conventions are right);
3. prefill+decode over the paged cache matches `forward_dense` under a
   window that actually binds.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.models.configs import tiny_test_config
from cxl_speckv_tpu.models.llama import (
    decode_step,
    forward_dense,
    init_params,
    prefill_chunk,
)
from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention
from cxl_speckv_tpu.ops.chunk_attention_pallas import paged_chunk_attention_pallas
from cxl_speckv_tpu.ops.paged_attention import paged_attention
from cxl_speckv_tpu.ops.paged_attention_ref import paged_attention_ref
from cxl_speckv_tpu.ops.quant import kv_storage_dtype

from helpers import build_pools

BLOCK = 8
HQ, HKV, D = 4, 2, 64
WINDOW = 12


def dense_windowed_decode(q, k, v, window, sm_scale=None):
    """Single-query windowed attention ground truth. q [Hq, D], k/v [L, Hkv, D]."""
    L, Hkv, _ = k.shape
    Hq = q.shape[0]
    g = Hq // Hkv
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32).reshape(Hkv, g, -1)
    s = jnp.einsum("hgd,lhd->hgl", qf, k.astype(jnp.float32)) * sm_scale
    pos = jnp.arange(L)
    s = jnp.where(pos[None, None, :] >= L - window, s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hgl,lhd->hgd", w, v.astype(jnp.float32)).reshape(Hq, -1)


def setup_pools(kv_dtype, lens=(5, 17, 32), seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2 * len(lens) + 1)
    keys = [jax.random.normal(ks[2 * i], (L, HKV, D)) for i, L in enumerate(lens)]
    vals = [jax.random.normal(ks[2 * i + 1], (L, HKV, D)) for i, L in enumerate(lens)]
    pools = build_pools(keys, vals, BLOCK, num_slots=32, kv_dtype=kv_dtype)
    q = jax.random.normal(ks[-1], (len(lens), HQ, D))
    return q, pools


# ---------------------------------------------------------------------------
# op level: window masking
# ---------------------------------------------------------------------------

def test_decode_ref_window_matches_dense():
    dt = KVDtype.BF16
    q, (kp, vp, ks, vs, table, lens, k_deq, v_deq) = setup_pools(dt)
    out = paged_attention_ref(q, kp, vp, ks, vs, table, lens, dt, window=WINDOW)
    for b in range(len(lens)):
        want = dense_windowed_decode(q[b], k_deq[b], v_deq[b], WINDOW)
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("dt", [KVDtype.BF16, KVDtype.INT8, KVDtype.INT4])
def test_decode_pallas_window_matches_ref(dt):
    q, (kp, vp, ks, vs, table, lens, _, _) = setup_pools(dt)
    want = paged_attention_ref(q, kp, vp, ks, vs, table, lens, dt, window=WINDOW)
    got = paged_attention(q, kp, vp, ks, vs, table, lens, dt,
                          interpret=True, window=WINDOW)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_decode_window_larger_than_seq_is_full_attention():
    # window >= seq_len must reduce to plain causal attention
    dt = KVDtype.INT8
    q, (kp, vp, ks, vs, table, lens, _, _) = setup_pools(dt)
    want = paged_attention_ref(q, kp, vp, ks, vs, table, lens, dt)
    got = paged_attention_ref(q, kp, vp, ks, vs, table, lens, dt, window=4096)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


@pytest.mark.parametrize("dt", [KVDtype.INT8, KVDtype.BF16])
def test_chunk_pallas_window_matches_jnp(dt):
    T = 4
    lens = (11, 26)
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
                                 start, dt, window=WINDOW)
    got = paged_chunk_attention_pallas(q, k_new, v_new, kp, vp, ks, vs, table,
                                       start, dt, interpret=True, window=WINDOW)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# model level: HF parity for the Mistral / Qwen2 conventions
# ---------------------------------------------------------------------------

def _hf_parity(hf_model, hf_cfg, seq_len=16):
    from cxl_speckv_tpu.models.hf_convert import (
        config_from_hf,
        params_from_hf_state_dict,
    )
    import torch

    cfg = config_from_hf(hf_cfg)
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                       dtype=jnp.float32)
    tokens = np.array([3, 17, 9, 25, 1, 4, 4, 7, 19, 2, 11, 30, 5, 8, 21, 13],
                      dtype=np.int64)[:seq_len]
    with torch.no_grad():
        want = hf_model(torch.tensor(tokens[None])).logits[0].float().numpy()
    got = np.asarray(forward_dense(params, cfg, jnp.asarray(tokens)[None])[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    return cfg


def test_hf_parity_mistral_sliding_window():
    torch = pytest.importorskip("torch")
    from transformers import MistralConfig, MistralForCausalLM

    hf_cfg = MistralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, max_position_embeddings=64,
        sliding_window=6, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = MistralForCausalLM(hf_cfg).eval()
    cfg = _hf_parity(hf_model, hf_cfg)
    assert cfg.sliding_window == 6  # the window must actually bind (seq 16)


def test_hf_parity_qwen2_bias():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, max_position_embeddings=64,
        use_sliding_window=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = _hf_parity(hf_model, hf_cfg)
    assert cfg.attn_bias and cfg.sliding_window is None


def test_hf_parity_qwen3_qk_norm():
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, max_position_embeddings=64,
        use_sliding_window=False, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = _hf_parity(hf_model, hf_cfg)
    assert cfg.qk_norm and not cfg.attn_bias


def test_hf_parity_phi3_fused_projections():
    """Phi-3: fused qkv_proj / gate_up_proj split into our separate weights
    (the math is llama-shaped; sliding_window rides the same field)."""
    torch = pytest.importorskip("torch")
    from transformers import Phi3Config, Phi3ForCausalLM

    hf_cfg = Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5,
        tie_word_embeddings=False, max_position_embeddings=64,
        sliding_window=None, attn_implementation="eager",
        pad_token_id=0,  # Phi3Config defaults to 32000, beyond the tiny vocab
    )
    torch.manual_seed(0)
    hf_model = Phi3ForCausalLM(hf_cfg).eval()
    _hf_parity(hf_model, hf_cfg)


def test_qwen3_engine_matches_dense_greedy():
    """The per-head qk-norm flows through every serving path: paged tiered
    generation continues exactly what dense greedy decoding produces."""
    import dataclasses

    from cxl_speckv_tpu.config import (
        CacheConfig, EngineConfig, KVDtype, PrefetchConfig, SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine
    from cxl_speckv_tpu.models.configs import tiny_test_config
    from cxl_speckv_tpu.models.llama import init_params

    cfg = dataclasses.replace(tiny_test_config(), qk_norm=True)
    params = init_params(cfg, jax.random.PRNGKey(5))
    prompt = list(np.random.RandomState(2).randint(1, 256, 12))
    # dense greedy continuation
    toks = list(prompt)
    for _ in range(8):
        logits = forward_dense(params, cfg, jnp.asarray(toks)[None])
        toks.append(int(jnp.argmax(logits[0, -1])))
    want = toks[len(prompt):]

    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=8, num_host_blocks=32,
                          kv_dtype=KVDtype.BF16),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=2, max_seq_len=64,
                            prefill_chunk=16, decode_horizon=2))
    eng = Engine(cfg, sc, params=params, use_pallas=False, enable_lstm=False)
    rid = eng.add_request([int(t) for t in prompt], max_new_tokens=8)
    outs = {o.req_id: o.tokens for o in eng.run()}
    assert outs[rid] == want


# ---------------------------------------------------------------------------
# paged-cache serving path under a binding window
# ---------------------------------------------------------------------------

SLOTS = 64
MAXB = 16


def _empty_pools(cfg, kv_dtype, slots=SLOTS, bs=BLOCK):
    pack = 2 if kv_dtype == KVDtype.INT4 else 1
    kt_shape = (cfg.num_layers, slots, cfg.head_dim // pack,
                cfg.num_kv_heads * bs)
    shape = (cfg.num_layers, slots, cfg.num_kv_heads, bs, cfg.head_dim // pack)
    kpool = jnp.zeros(kt_shape, kv_storage_dtype(kv_dtype))
    sc = jnp.ones((cfg.num_layers, slots, 1,
                   cfg.num_kv_heads * bs), jnp.float32)
    return (kpool, jnp.zeros(shape, kv_storage_dtype(kv_dtype)), sc,
            jnp.ones_like(sc))


# ---------------------------------------------------------------------------
# engine level: sliding-window block retirement
# ---------------------------------------------------------------------------

def _window_engine(hbm_blocks, host_blocks, params, cfg, batch=2):
    from cxl_speckv_tpu.config import (
        CacheConfig,
        EngineConfig,
        PrefetchConfig,
        SystemConfig,
    )
    from cxl_speckv_tpu.engine.engine import Engine

    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=hbm_blocks,
                          num_host_blocks=host_blocks, kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(enabled=True, depth=2),
        engine=EngineConfig(max_batch_size=batch, max_seq_len=160,
                            prefill_chunk=32, decode_horizon=1),
    )
    return Engine(cfg, sc, params=params, use_pallas=False, seed=0)


def test_engine_window_retirement_token_identical():
    """Windowed serving must be tiering-invisible AND actually retire
    out-of-window blocks (the paged rolling buffer)."""
    cfg = dataclasses.replace(tiny_test_config(), sliding_window=WINDOW)
    params = init_params(cfg, jax.random.PRNGKey(42))
    rng = np.random.RandomState(5)
    ps = [rng.randint(1, cfg.vocab_size, rng.randint(8, 20)).tolist()
          for _ in range(4)]

    ample = _window_engine(256, 256, params, cfg)
    for p in ps:
        ample.add_request(p, max_new_tokens=40)
    outs_a = {o.req_id: o.tokens for o in ample.run()}
    st = ample.kvc.stats
    assert st.window_retired_blocks > 0

    tight = _window_engine(10, 256, params, cfg)
    for p in ps:
        tight.add_request(p, max_new_tokens=40)
    outs_t = {o.req_id: o.tokens for o in tight.run()}
    assert outs_t == outs_a


def test_engine_window_serves_past_total_capacity():
    """With a 12-token window, a sequence can generate past the TOTAL
    (HBM+host) block capacity — retired blocks recycle. The same run
    without a window exhausts the pool and finishes 'oom'."""
    prompt = list(range(1, 17))  # 16 tokens, 2 blocks
    # 150 total tokens = 19 blocks > 8 hbm + 6 host = 14 total blocks
    cfg_w = dataclasses.replace(tiny_test_config(), sliding_window=WINDOW)
    params = init_params(cfg_w, jax.random.PRNGKey(42))
    eng = _window_engine(8, 6, params, cfg_w, batch=1)
    eng.add_request(prompt, max_new_tokens=134)
    outs = eng.run()
    assert outs[0].finish_reason in ("length", "eos")
    if outs[0].finish_reason == "length":
        assert len(outs[0].tokens) == 134

    cfg_full = tiny_test_config()
    eng2 = _window_engine(8, 6, params, cfg_full, batch=1)
    eng2.add_request(prompt, max_new_tokens=134)
    outs2 = eng2.run()
    assert outs2[0].finish_reason == "oom"


def test_engine_window_spec_decode_identity():
    """Greedy speculative decoding under a sliding window emits exactly the
    plain windowed engine's tokens, while window retirement recycles both
    target blocks AND the spec draft-cache slots."""
    from cxl_speckv_tpu.config import (
        CacheConfig,
        EngineConfig,
        PrefetchConfig,
        SystemConfig,
    )
    from cxl_speckv_tpu.engine.engine import Engine
    from cxl_speckv_tpu.models.configs import LlamaConfig

    cfg = dataclasses.replace(tiny_test_config(), sliding_window=WINDOW)
    params = init_params(cfg, jax.random.PRNGKey(42))
    draft_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=32, intermediate_size=64,
        num_layers=1, num_q_heads=2, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, tie_embeddings=False, max_seq_len=512,
        eos_token_id=0, dtype="float32", sliding_window=WINDOW,
    )
    draft_params = init_params(draft_cfg, jax.random.PRNGKey(7))

    def build(spec):
        sc = SystemConfig(
            cache=CacheConfig(block_size=8, num_hbm_blocks=64,
                              num_host_blocks=128, kv_dtype=KVDtype.INT8),
            prefetch=PrefetchConfig(enabled=True, depth=2),
            engine=EngineConfig(max_batch_size=2, max_seq_len=160,
                                prefill_chunk=32),
        )
        kw = (dict(draft_config=draft_cfg, draft_params=draft_params,
                   spec_gamma=3) if spec else {})
        return Engine(cfg, sc, params=params, use_pallas=False, seed=0, **kw)

    rng = np.random.RandomState(11)
    ps = [rng.randint(1, cfg.vocab_size, rng.randint(8, 20)).tolist()
          for _ in range(3)]

    plain = build(spec=False)
    for p in ps:
        plain.add_request(p, max_new_tokens=40)
    outs_p = {o.req_id: o.tokens for o in plain.run()}

    spec = build(spec=True)
    for p in ps:
        spec.add_request(p, max_new_tokens=40)
    outs_s = {o.req_id: o.tokens for o in spec.run()}
    assert outs_s == outs_p
    assert spec.kvc.stats.window_retired_blocks > 0
    assert spec.spec.stats.rounds > 0


@pytest.mark.parametrize("attn_bias", [False, True])
def test_paged_windowed_decode_matches_dense(attn_bias):
    cfg = dataclasses.replace(tiny_test_config(), sliding_window=WINDOW,
                              attn_bias=attn_bias)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    if attn_bias:
        assert "q_bias" in params["layers"]
    tokens = jax.random.randint(jax.random.PRNGKey(1), (21,), 0, cfg.vocab_size)
    want = np.asarray(forward_dense(params, cfg, tokens[None])[0])

    kp, vp, ks, vs = _empty_pools(cfg, KVDtype.BF16)
    table = jnp.arange(1, MAXB + 1, dtype=jnp.int32)[None, :]
    prefill_len = 13  # > WINDOW so the window binds inside prefill too
    logits = []
    lg, kp, vp, ks, vs = prefill_chunk(
        params, cfg, KVDtype.BF16, tokens[:prefill_len],
        jnp.int32(0), kp, vp, ks, vs, table[0])
    logits.append(lg)
    for t in range(prefill_len, len(tokens)):
        lg, kp, vp, ks, vs = decode_step(
            params, cfg, KVDtype.BF16,
            tokens[t][None], jnp.array([t], jnp.int32),
            kp, vp, ks, vs, table, jnp.array([t + 1], jnp.int32))
        logits.append(lg[0])
    got = np.asarray(jnp.stack(logits))
    np.testing.assert_allclose(got, want[prefill_len - 1:], rtol=3e-2, atol=3e-2)
    assert (got.argmax(-1) == want[prefill_len - 1:].argmax(-1)).all()
