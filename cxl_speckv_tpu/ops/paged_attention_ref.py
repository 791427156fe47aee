"""Reference (pure-jnp) paged attention over the quantized block pool.

Semantics contract for the Pallas kernel in `paged_attention.py` — tested
equal. Gathers KV blocks through the block table, dequantizes, and runs
masked softmax attention. This materializes dequantized KV (fine on CPU /
for testing); the Pallas kernel streams blocks and never materializes them.

Pool layout (per layer, r3):
    k_pool : [num_slots, head_dim/pack, num_kv_heads*block_size]  ("kT" —
             transposed so the Pallas QK matmul is MXU-native; INT4 packs
             along the head_dim/sublane axis)
    v_pool : [num_slots, num_kv_heads, block_size, head_dim/pack]
    k_scale, v_scale : [num_slots, 1, num_kv_heads*block_size] float32
             (flat kT-order columns)

The per-row scales make dequantization *post-matmul*: for K,
q . (k_q * s)^T == (q . k_q^T) * s^T, and for V, (w * s_v) . v_q — so the
matmuls run on raw quantized values and scales fold into the score/weight
vectors. This is the TPU analog of the FPGA decompressing on the datapath
(`hardware/rtl/kv_decompress.v`): compressed KV never exists at full
precision in memory.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.ops.quant import _unpack_int4

NEG_INF = -1e30


def _cap(s: jax.Array, softcap: float | None) -> jax.Array:
    """Gemma-2 tanh score softcapping (static no-op when None)."""
    return s if softcap is None else softcap * jnp.tanh(s / softcap)


def _dequant_block(q: jax.Array, kv_dtype: KVDtype,
                   scheme_id: jax.Array | None = None) -> jax.Array:
    """Raw pool storage -> float32 values (scales applied separately).

    With kv_dtype == MIXED8 the interpretation of the int8 bytes is chosen
    by the traced scalar `scheme_id` (0 = INT8, 1 = FP8) — the per-layer
    mixed-precision path."""
    if kv_dtype == KVDtype.MIXED8:
        i8 = q.astype(jnp.float32)
        f8 = jax.lax.bitcast_convert_type(q, jnp.float8_e4m3fn).astype(jnp.float32)
        f8 = jnp.where(jnp.isnan(f8), 0.0, f8)
        return jnp.where(scheme_id == 0, i8, f8)
    if kv_dtype == KVDtype.INT4:
        q = _unpack_int4(q)
    elif kv_dtype == KVDtype.FP8 and q.dtype == jnp.int8:
        q = jax.lax.bitcast_convert_type(q, jnp.float8_e4m3fn)
    x = q.astype(jnp.float32)
    if kv_dtype == KVDtype.FP8:
        # slots written under another scheme (guard, pre-switch blocks) can
        # bitcast to e4m3 NaN; masked-softmax relies on finite junk (the
        # finite NEG_INF design), so sanitize — real FP8 data is never NaN
        x = jnp.where(jnp.isnan(x), 0.0, x)
    return x


def _dequant_kt_blocks(ktb: jax.Array, num_kv_heads: int, kv_dtype: KVDtype,
                       scheme_id: jax.Array | None = None) -> jax.Array:
    """Gathered kT blocks [..., D/pack, Hkv*bs] -> dequantized LOGICAL
    token-major [..., Hkv, bs, D] float32 (scales separate). INT4 unpacks
    along the sublane (D) axis — the kT packing (r3 layout)."""
    if kv_dtype == KVDtype.INT4:
        r = ktb.astype(jnp.int32)
        x = jnp.concatenate([(r << 28) >> 28, (r << 24) >> 28],
                            axis=-2).astype(jnp.float32)
    else:
        x = _dequant_block(ktb, kv_dtype, scheme_id)
    x = x.reshape(*x.shape[:-1], num_kv_heads, -1)   # [..., D, Hkv, bs]
    return jnp.moveaxis(x, -3, -1)                   # [..., Hkv, bs, D]


def sink_softmax(scores: jax.Array, sink: jax.Array | None) -> jax.Array:
    """Softmax with a learned per-head sink logit in the denominator
    (GPT-OSS attention sinks): equivalent to softmax([scores, sink]) with
    the sink column dropped — the sink is an always-available "null" token
    with no value vector. `sink` must broadcast against scores[..., :1];
    None = plain softmax."""
    if sink is None:
        return jax.nn.softmax(scores, axis=-1)
    m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sink)
    p = jnp.exp(scores - m)
    return p / (jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(sink - m))


def paged_attention_ref(
    q: jax.Array,              # [B, num_q_heads, head_dim]
    k_pool: jax.Array,         # [num_slots, D/pack, Hkv*block_size] (kT)
    v_pool: jax.Array,         # [num_slots, H_kv, block_size, D/pack]
    k_scale: jax.Array,        # [num_slots, H_kv, block_size]
    v_scale: jax.Array,
    block_table: jax.Array,    # [B, max_blocks] int32 (clamped >= 0)
    seq_lens: jax.Array,       # [B] int32, includes the token(s) being decoded
    kv_dtype: KVDtype,
    sm_scale: float | None = None,
    scheme_id: jax.Array | None = None,   # MIXED8: 0=INT8 / 1=FP8 per call
    window: int | None = None,            # sliding window (Mistral family)
    softcap: float | None = None,         # tanh score cap (Gemma family)
    sinks: jax.Array | None = None,       # [Hq] learned sink logits (GPT-OSS)
) -> jax.Array:
    """Decode-step attention: one query token per sequence.

    With `window`, each query (at position len_b - 1) attends only to
    positions in [len_b - window, len_b - 1]."""
    B, num_q_heads, head_dim = q.shape
    _, num_kv_heads, block_size, _ = v_pool.shape
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5

    def per_seq(q_b, table_b, len_b):
        # gather and dequantize this sequence's blocks
        k = _dequant_kt_blocks(k_pool[table_b], num_kv_heads, kv_dtype,
                               scheme_id)                  # [M, Hkv, bs, D]
        v = _dequant_block(v_pool[table_b], kv_dtype, scheme_id)
        # flat scale pools [S, 1, Hkv*bs] -> [M, Hkv, bs] (free reshape)
        ks = k_scale[table_b].reshape(-1, num_kv_heads, block_size)
        vs = v_scale[table_b].reshape(-1, num_kv_heads, block_size)
        M = table_b.shape[0]
        L = M * block_size
        k = k.transpose(0, 2, 1, 3).reshape(L, num_kv_heads, head_dim)
        v = v.transpose(0, 2, 1, 3).reshape(L, num_kv_heads, head_dim)
        ks = ks.transpose(0, 2, 1).reshape(L, num_kv_heads)  # [L, Hkv]
        vs = vs.transpose(0, 2, 1).reshape(L, num_kv_heads)

        qg = q_b.reshape(num_kv_heads, group, head_dim).astype(jnp.float32)
        # scores: [Hkv, G, L]; K dequant applied post-matmul via ks
        scores = jnp.einsum("hgd,lhd->hgl", qg, k) * ks.T[:, None, :] * sm_scale
        scores = _cap(scores, softcap)
        pos = jnp.arange(L)
        valid = pos < len_b
        if window is not None:
            valid = valid & (pos >= len_b - window)
        scores = jnp.where(valid[None, None, :], scores, NEG_INF)
        sk = (sinks.reshape(num_kv_heads, group, 1).astype(jnp.float32)
              if sinks is not None else None)
        w = sink_softmax(scores, sk)
        # V dequant folded into the weights
        out = jnp.einsum("hgl,lhd->hgd", w * vs.T[:, None, :], v)
        return out.reshape(num_q_heads, head_dim)

    return jax.vmap(per_seq)(q, block_table, seq_lens).astype(q.dtype)


def _sink4(sinks, hkv, group):
    """[Hq] -> [Hkv, G, 1, 1] f32 (or None)."""
    if sinks is None:
        return None
    return sinks.reshape(hkv, group, 1, 1).astype(jnp.float32)


def prefill_attention_ref(
    q: jax.Array,              # [T, num_q_heads, head_dim] fresh queries
    k_new: jax.Array,          # [T, H_kv, D] fresh (unquantized) keys
    v_new: jax.Array,
    start_pos: int,            # absolute position of q[0] (tokens before chunk)
    k_pool: jax.Array | None = None,   # context already in the pool
    v_pool: jax.Array | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    block_table_row: jax.Array | None = None,  # [max_blocks] for this seq
    kv_dtype: KVDtype = KVDtype.INT8,
    sm_scale: float | None = None,
    window: int | None = None,
    softcap: float | None = None,
    sinks: jax.Array | None = None,       # [Hq] learned sink logits (GPT-OSS)
) -> jax.Array:
    """Chunked-prefill attention for a single sequence.

    Causal over the fresh chunk, plus full attention to the `start_pos`
    context tokens already resident (quantized) in the pool.
    """
    T, num_q_heads, head_dim = q.shape
    num_kv_heads = k_new.shape[1]
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5

    qg = q.reshape(T, num_kv_heads, group, head_dim).astype(jnp.float32)
    kf = k_new.astype(jnp.float32)
    vf = v_new.astype(jnp.float32)
    # causal scores within the chunk: [Hkv, G, T, T]
    scores_new = _cap(jnp.einsum("thgd,shd->hgts", qg, kf) * sm_scale, softcap)
    t_idx = jnp.arange(T)
    causal = t_idx[:, None] >= t_idx[None, :]
    if window is not None:
        causal = causal & (t_idx[:, None] - t_idx[None, :] < window)
    scores_new = jnp.where(causal[None, None], scores_new, NEG_INF)

    if start_pos and k_pool is not None:
        block_size = v_pool.shape[2]
        k_ctx = _dequant_kt_blocks(k_pool[block_table_row], num_kv_heads,
                                   kv_dtype)
        v_ctx = _dequant_block(v_pool[block_table_row], kv_dtype)
        M = block_table_row.shape[0]
        L = M * block_size
        k_ctx = k_ctx.transpose(0, 2, 1, 3).reshape(L, num_kv_heads, head_dim)
        v_ctx = v_ctx.transpose(0, 2, 1, 3).reshape(L, num_kv_heads, head_dim)
        sc3 = lambda s: (s[block_table_row]
                         .reshape(M, num_kv_heads, block_size)
                         .transpose(0, 2, 1).reshape(L, num_kv_heads))
        ks, vs = sc3(k_scale), sc3(v_scale)
        scores_ctx = _cap(
            jnp.einsum("thgd,lhd->hgtl", qg, k_ctx)
            * ks.T[:, None, None, :] * sm_scale, softcap)
        pos = jnp.arange(L)
        ctx_ok = pos[None, :] < start_pos                       # [1, L]
        if window is not None:
            # query t sits at absolute position start_pos + t
            lower = start_pos + t_idx - window + 1              # [T]
            ctx_ok = ctx_ok & (pos[None, :] >= lower[:, None])  # [T, L]
        scores_ctx = jnp.where(ctx_ok[None, None], scores_ctx, NEG_INF)
        scores = jnp.concatenate([scores_ctx, scores_new], axis=-1)
        w = sink_softmax(scores, _sink4(sinks, num_kv_heads, group))
        w_ctx, w_new = w[..., :L], w[..., L:]
        out = jnp.einsum("hgtl,lhd->thgd", w_ctx * vs.T[:, None, None, :], v_ctx)
        out = out + jnp.einsum("hgts,shd->thgd", w_new, vf)
    else:
        w = sink_softmax(scores_new, _sink4(sinks, num_kv_heads, group))
        out = jnp.einsum("hgts,shd->thgd", w, vf)
    return out.reshape(T, num_q_heads, head_dim).astype(q.dtype)
