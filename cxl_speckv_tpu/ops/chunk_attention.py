"""Batched multi-token attention over paged quantized context.

Used by speculative-decoding verification (`models/llama.py:verify_step`):
each sequence scores a chunk of T proposed tokens in one pass — causal within
the chunk, full attention to the sequence's quantized pool context.

Unlike the single-sequence prefill reference (which gathers the whole
max_blocks*bs context at once), this streams context blocks with
`lax.scan` + online softmax, so peak memory is O(B*T*bs) regardless of
context length — the jnp analog of flash-decoding, XLA-friendly (static
shapes, no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.ops.paged_attention_ref import (_dequant_block,
                                                    _dequant_kt_blocks)

NEG_INF = -1e30


def paged_chunk_attention(
    q: jax.Array,            # [B, T, Hq, D] fresh queries (rope applied)
    k_new: jax.Array,        # [B, T, Hkv, D] fresh keys (rope applied, unquantized)
    v_new: jax.Array,
    k_pool: jax.Array,       # [S, D/pack, Hkv*bs] (kT layout)
    v_pool: jax.Array,       # [S, Hkv, bs, D/pack]
    k_scale: jax.Array,      # [S, 1, Hkv*bs] f32 (flat kT-order)
    v_scale: jax.Array,
    block_table: jax.Array,  # [B, max_blocks] int32 (clamped >= 0)
    start_pos: jax.Array,    # [B] int32 — pool tokens < start_pos are context
    kv_dtype: KVDtype,
    sm_scale: float | None = None,
    scheme_id: jax.Array | None = None,   # MIXED8: 0=INT8 / 1=FP8 per call
    window: int | None = None,            # sliding window (Mistral family)
    softcap: float | None = None,         # tanh score cap (Gemma family)
    sinks: jax.Array | None = None,       # [Hq] learned sink logits (GPT-OSS)
) -> jax.Array:
    """Returns [B, T, Hq, D]."""
    B, T, num_q_heads, head_dim = q.shape
    _, num_kv_heads, block_size, _ = v_pool.shape
    max_blocks = block_table.shape[1]
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5

    qg = q.reshape(B, T, num_kv_heads, group, head_dim).astype(jnp.float32)

    # ---- streamed context attention (online softmax over pool blocks) ----
    def block_step(carry, m):
        m_acc, l_acc, o_acc = carry                    # [B,Hkv,G,T,1]x2, [B,Hkv,G,T,D]
        slots = block_table[:, m]                      # [B]
        kblk = _dequant_kt_blocks(k_pool[slots], num_kv_heads, kv_dtype,
                                  scheme_id)           # [B, Hkv, bs, D]
        vblk = _dequant_block(v_pool[slots], kv_dtype, scheme_id)
        # flat scale pools [S, 1, Hkv*bs] -> [B, Hkv, bs]
        ks = k_scale[slots].reshape(-1, num_kv_heads, block_size)
        vs = v_scale[slots].reshape(-1, num_kv_heads, block_size)
        s = jnp.einsum("bthgd,bhsd->bhgts", qg, kblk,
                       precision=jax.lax.Precision.HIGHEST)  # [B,Hkv,G,T,bs]
        s = s * ks[:, :, None, None, :] * sm_scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        pos = m * block_size + jnp.arange(block_size)
        valid = pos[None, :] < start_pos[:, None]      # [B, bs]
        valid = valid[:, None, None, None, :]          # [B,1,1,1,bs]
        if window is not None:
            # query t sits at absolute position start_pos + t and attends
            # positions in [start_pos + t - window + 1, start_pos + t]
            t_idx = jnp.arange(T)
            lo = start_pos[:, None] + t_idx[None, :] - window   # [B, T]
            in_win = pos[None, None, :] > lo[:, :, None]        # [B, T, bs]
            valid = valid & in_win[:, None, None, :, :]
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m_acc, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_acc - m_new)
        l_acc = l_acc * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = p * vs[:, :, None, None, :]
        o_acc = o_acc * alpha + jnp.einsum(
            "bhgts,bhsd->bhgtd", pv, vblk,
            precision=jax.lax.Precision.HIGHEST)
        return (m_new, l_acc, o_acc), None

    shape5 = (B, num_kv_heads, group, T)
    init = (
        jnp.full((*shape5, 1), NEG_INF),
        jnp.zeros((*shape5, 1)),
        jnp.zeros((*shape5, head_dim)),
    )
    (m_acc, l_acc, o_acc), _ = jax.lax.scan(
        block_step, init, jnp.arange(max_blocks))

    # ---- in-chunk causal attention merged into the same running softmax ---
    kf = k_new.astype(jnp.float32)
    vf = v_new.astype(jnp.float32)
    s = jnp.einsum("bthgd,bshd->bhgts", qg, kf,
                   precision=jax.lax.Precision.HIGHEST) * sm_scale  # [B,Hkv,G,T,T]
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    t_idx = jnp.arange(T)
    causal = t_idx[:, None] >= t_idx[None, :]
    if window is not None:
        causal = causal & (t_idx[:, None] - t_idx[None, :] < window)
    s = jnp.where(causal[None, None, None], s, NEG_INF)
    m_new = jnp.maximum(m_acc, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_acc - m_new)
    l_acc = l_acc * alpha + jnp.sum(p, axis=-1, keepdims=True)
    o_acc = o_acc * alpha + jnp.einsum("bhgts,bshd->bhgtd", p, vf,
                                       precision=jax.lax.Precision.HIGHEST)

    if sinks is not None:
        # the sink is one extra logit per (head, query) with no value: it
        # joins the running max and the denominator at finalize (m_new is
        # the post-merge running max)
        sk = (sinks.reshape(num_kv_heads, group)
              .astype(jnp.float32)[None, :, :, None, None])
        m_fin = jnp.maximum(m_new, sk)
        a2 = jnp.exp(m_new - m_fin)
        l_acc = l_acc * a2 + jnp.exp(sk - m_fin)
        o_acc = o_acc * a2
    out = o_acc / l_acc                                # [B,Hkv,G,T,D]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, num_q_heads, head_dim).astype(q.dtype)
