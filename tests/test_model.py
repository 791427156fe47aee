"""Model correctness: HF-transformers logit parity + paged-cache decode parity.

The critical invariant chain:
1. `forward_dense` matches `transformers.LlamaForCausalLM` logits on the same
   random weights (architecture + RoPE + norms are right).
2. prefill+decode over the paged BF16 (lossless) cache matches
   `forward_dense` exactly (the cache path is right).
3. prefill+decode over INT8 cache stays within quantization tolerance.
"""

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
from cxl_speckv_tpu.ops.quant import kv_storage_dtype


CFG = tiny_test_config()
BS = 8           # block size
SLOTS = 64
MAXB = 16


def empty_pools(cfg, kv_dtype, slots=SLOTS, bs=BS):
    pack = 2 if kv_dtype == KVDtype.INT4 else 1
    kt_shape = (cfg.num_layers, slots, cfg.head_dim // pack,
                cfg.num_kv_heads * bs)
    shape = (cfg.num_layers, slots, cfg.num_kv_heads, bs, cfg.head_dim // pack)
    kp = jnp.zeros(kt_shape, kv_storage_dtype(kv_dtype))
    sc = jnp.ones((cfg.num_layers, slots, 1,
                   cfg.num_kv_heads * bs), jnp.float32)
    return kp, jnp.zeros(shape, kv_storage_dtype(kv_dtype)), sc, jnp.ones_like(sc)


def run_cached(params, cfg, kv_dtype, tokens, prefill_len):
    """Prefill then decode the rest; returns stacked logits for all positions
    produced (last prefill token + each decode step)."""
    kp, vp, ks, vs = empty_pools(cfg, kv_dtype)
    table = jnp.arange(1, MAXB + 1, dtype=jnp.int32)[None, :]  # slots 1..MAXB
    logits_list = []
    lg, kp, vp, ks, vs = prefill_chunk(
        params, cfg, kv_dtype, tokens[:prefill_len],
        jnp.int32(0), kp, vp, ks, vs, table[0])
    logits_list.append(lg)
    for t in range(prefill_len, len(tokens)):
        lg, kp, vp, ks, vs = decode_step(
            params, cfg, kv_dtype,
            tokens[t][None], jnp.array([t], jnp.int32),
            kp, vp, ks, vs, table, jnp.array([t + 1], jnp.int32))
        logits_list.append(lg[0])
    return jnp.stack(logits_list)


@pytest.fixture(scope="module")
def setup():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (21,), 0, CFG.vocab_size)
    return params, tokens


def test_hf_parity(setup):
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    from cxl_speckv_tpu.models.hf_convert import config_from_hf, params_from_hf_state_dict

    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_layers,
        num_attention_heads=CFG.num_q_heads,
        num_key_value_heads=CFG.num_kv_heads,
        head_dim=CFG.head_dim,
        rope_theta=CFG.rope_theta, rms_norm_eps=CFG.rms_eps,
        tie_word_embeddings=False, max_position_embeddings=CFG.max_seq_len,
        attention_bias=False, mlp_bias=False,
    )
    torch.manual_seed(0)
    hf_model = LlamaForCausalLM(hf_cfg).eval()

    cfg = config_from_hf(hf_cfg)
    assert cfg.head_dim == CFG.head_dim and cfg.q_group == CFG.q_group
    params = params_from_hf_state_dict(hf_model.state_dict(), cfg, dtype=jnp.float32)

    _, tokens = None, np.array([3, 17, 9, 250, 1, 42, 42, 7], dtype=np.int64)
    with torch.no_grad():
        want = hf_model(torch.tensor(tokens[None])).logits[0].float().numpy()
    got = np.asarray(forward_dense(params, cfg, jnp.asarray(tokens)[None])[0])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # r5: quantize-at-conversion (the 8B-on-16GB loading story — the
    # full-precision tree must never exist on device) is byte-identical
    # to converting full-precision and quantizing afterwards: same
    # quantize_weights, f32 math, CPU backend.
    from cxl_speckv_tpu.ops.wquant import is_quantized, quantize_weights
    pq = params_from_hf_state_dict(hf_model.state_dict(), cfg,
                                   dtype=jnp.float32, weight_dtype="int8")
    assert is_quantized(pq)
    want_q = quantize_weights(params)
    for path_got, path_want in zip(
            jax.tree_util.tree_leaves_with_path(pq),
            jax.tree_util.tree_leaves_with_path(want_q)):
        assert path_got[0] == path_want[0]
        np.testing.assert_array_equal(np.asarray(path_got[1]),
                                      np.asarray(path_want[1]),
                                      err_msg=str(path_got[0]))


def test_paged_bf16_matches_dense(setup):
    params, tokens = setup
    want = np.asarray(forward_dense(params, CFG, tokens[None])[0])  # [T, V]
    got = np.asarray(run_cached(params, CFG, KVDtype.BF16, tokens, prefill_len=13))
    # positions covered: 12 (last prefill) .. 20. The cache stores KV in
    # bf16 while the dense reference keeps f32 — small rounding drift allowed.
    np.testing.assert_allclose(got, want[12:], rtol=3e-2, atol=3e-2)
    assert (got.argmax(-1) == want[12:].argmax(-1)).all()


def test_paged_int8_close_to_dense(setup):
    params, tokens = setup
    want = np.asarray(forward_dense(params, CFG, tokens[None])[0])
    got = np.asarray(run_cached(params, CFG, KVDtype.INT8, tokens, prefill_len=13))
    # INT8 KV: small logit drift allowed, ranking should agree
    err = np.abs(got - want[12:]).max() / (np.abs(want[12:]).max() + 1e-9)
    assert err < 0.05, f"relative max logit err {err}"
    agree = (got.argmax(-1) == want[12:].argmax(-1)).mean()
    assert agree >= 0.8


def test_multi_seq_decode_batch(setup):
    """Two sequences decoding concurrently with different lengths/tables."""
    params, tokens = setup
    kv_dtype = KVDtype.BF16
    kp, vp, ks, vs = empty_pools(CFG, kv_dtype)
    t1, t2 = tokens[:9], tokens[5:17]
    table = jnp.stack([
        jnp.arange(1, MAXB + 1, dtype=jnp.int32),
        jnp.arange(21, 20 + MAXB + 1, dtype=jnp.int32),
    ])
    lg1, kp, vp, ks, vs = prefill_chunk(params, CFG, kv_dtype, t1[:-1],
                                        jnp.int32(0), kp, vp, ks, vs, table[0])
    lg2, kp, vp, ks, vs = prefill_chunk(params, CFG, kv_dtype, t2[:-1],
                                        jnp.int32(0), kp, vp, ks, vs, table[1])
    # now decode last token of each jointly
    step_toks = jnp.stack([t1[-1], t2[-1]])
    positions = jnp.array([len(t1) - 1, len(t2) - 1], jnp.int32)
    lens = positions + 1
    lg, *_ = decode_step(params, CFG, kv_dtype, step_toks, positions,
                         kp, vp, ks, vs, table, lens)
    want1 = forward_dense(params, CFG, t1[None])[0, -1]
    want2 = forward_dense(params, CFG, t2[None])[0, -1]
    np.testing.assert_allclose(np.asarray(lg[0]), np.asarray(want1), rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(lg[1]), np.asarray(want2), rtol=3e-2, atol=3e-2)
