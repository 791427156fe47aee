"""Sequence parallelism: ring attention over an "sp" mesh axis.

NEW relative to the reference (SURVEY.md §2.6/§5: no sequence parallelism
anywhere in that tree — its long-context story is KV *capacity* expansion,
which this build implements as tiering + compression + host streaming).
Ring attention complements that capacity story with a *compute* scaling
path for scoring/prefilling contexts whose activations exceed one chip:
the sequence axis shards over "sp", every device holds its q/k/v chunk,
and KV chunks rotate around the ring with `lax.ppermute` while each
device accumulates online-softmax partials — attention memory stays
O(T/S) per device and the p2p hops ride ICI (the blockwise/ring-attention
construction; arXiv:2310.01889).

Like `parallel/pipeline.py`, this serves the batch-scoring/long-prefill
regime. The decode serving path keeps dp/ep/tp + the tiered paged cache
(one query token per step has nothing to shard over sequence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from cxl_speckv_tpu.models.configs import LlamaConfig
from cxl_speckv_tpu.models.llama import (
    _block_residuals,
    _norm,
    _qkv,
    _soft_cap,
    apply_rope,
    pick_rope,
    rope_frequency_pair,
)
from cxl_speckv_tpu.ops.wquant import mm, take_rows

_NEG = -1e30


def _ring_attention_local(q, k, v, q_pos, kv_pos0, t_local, config,
                          sinks=None,
                          window=None):
    """Inside-shard_map body: online-softmax over rotating KV chunks.

    q [B, Tl, Hq, D]; k/v [B, Tl, Hkv, D] (the local chunk, rotated);
    q_pos [Tl] global positions of the local queries; kv_pos0 scalar global
    position of the held KV chunk's first token (changes per rotation).
    """
    c = config
    S = jax.lax.axis_size("sp")
    B, Tl = q.shape[:2]
    qg = (q.reshape(B, Tl, c.num_kv_heads, c.q_group, c.head_dim)
          .astype(jnp.float32))
    sm = c.sm_scale

    def step(carry, i):
        k_cur, v_cur, kv0, m, l, acc = carry
        kv_pos = kv0 + jnp.arange(Tl)                        # [Tl] global
        s = jnp.einsum("bthgd,bshd->bhgts", qg,
                       k_cur.astype(jnp.float32)) * sm       # [B,Hkv,G,Tl,Tl]
        s = _soft_cap(s, c.attn_softcap)
        mask = q_pos[:, None] >= kv_pos[None, :]             # causal
        if window is not None:
            mask &= q_pos[:, None] - kv_pos[None, :] < window
        s = jnp.where(mask[None, None, None], s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        scale = jnp.exp(m - m_new)
        l = l * scale + jnp.sum(p, axis=-1)
        acc = acc * scale[..., None] + jnp.einsum(
            "bhgts,bshd->bhgtd", p, v_cur.astype(jnp.float32))
        # rotate the KV chunk (and its origin) one hop around the ring
        perm = [(j, (j + 1) % S) for j in range(S)]
        k_cur = jax.lax.ppermute(k_cur, "sp", perm)
        v_cur = jax.lax.ppermute(v_cur, "sp", perm)
        kv0 = jax.lax.ppermute(kv0, "sp", perm)
        return (k_cur, v_cur, kv0, m_new, l, acc), None

    m0 = jnp.full((B, c.num_kv_heads, c.q_group, Tl), _NEG, jnp.float32)
    l0 = jnp.zeros_like(m0)
    acc0 = jnp.zeros((B, c.num_kv_heads, c.q_group, Tl, c.head_dim),
                     jnp.float32)
    (_, _, _, m, l, acc), _ = jax.lax.scan(
        step, (k, v, kv_pos0, m0, l0, acc0), jnp.arange(S))
    if sinks is not None:
        # GPT-OSS sink: one extra logit per head, no value — joins the
        # final max/denominator after all ring rotations
        sk = (sinks.reshape(c.num_kv_heads, c.q_group)
              .astype(jnp.float32)[None, :, :, None])
        m_fin = jnp.maximum(m, sk)
        a2 = jnp.exp(m - m_fin)
        l = l * a2 + jnp.exp(sk - m_fin)
        acc = acc * a2[..., None]
    out = acc / jnp.maximum(l, 1e-30)[..., None]             # [B,Hkv,G,Tl,D]
    return out.transpose(0, 3, 1, 2, 4).reshape(B, Tl, -1)


@functools.partial(jax.jit, static_argnames=("config", "mesh"))
def sp_forward_dense(
    params,
    config: LlamaConfig,
    token_ids: jax.Array,       # [B, T] int32, T % sp == 0
    *,
    mesh: Mesh,
) -> jax.Array:
    """Full causal forward with the sequence axis sharded over "sp" and
    ring attention in every layer. Logits [B, T, V], numerically matching
    `forward_dense` up to online-softmax accumulation order."""
    c = config
    S = mesh.shape["sp"]
    B, T = token_ids.shape
    if T % S:
        raise ValueError(f"seq len {T} not divisible by sp={S}")
    Tl = T // S
    rope_fs = rope_frequency_pair(c)
    head = (params["embed"].T if c.tie_embeddings else params["lm_head"])

    wins = c.layer_windows()
    period = 1
    if len(set(wins)) > 1:
        period = len(c.attn_pattern)
        if c.num_layers % period:
            raise ValueError("num_layers not divisible by attn_pattern period")

    def fn(layers, embed, head, final_norm, tokens):
        # tokens arrives sequence-sharded: [B, Tl]
        idx = jax.lax.axis_index("sp")
        q_pos = idx * Tl + jnp.arange(Tl)
        x = take_rows(embed, tokens,
                      dtype=jnp.dtype(c.dtype))              # [B, Tl, H]
        if c.embed_scale:
            x = x * jnp.asarray(c.hidden_size**0.5, x.dtype)

        def one_layer(x, lp, window):
            inv_freq = pick_rope(rope_fs, window)
            h = _norm(x, lp["attn_norm"], c)
            q, k, v = _qkv(h, lp, c)
            q = apply_rope(q.reshape(B, Tl, c.num_q_heads, c.head_dim),
                           q_pos[None], inv_freq)
            k = apply_rope(k.reshape(B, Tl, c.num_kv_heads, c.head_dim),
                           q_pos[None], inv_freq)
            v = v.reshape(B, Tl, c.num_kv_heads, c.head_dim)
            o = _ring_attention_local(q, k, v, q_pos, idx * Tl, Tl, c,
                                      sinks=lp.get("sinks"), window=window)
            return _block_residuals(x, o, lp, c)

        if period == 1:
            def layer(x, lp):
                return one_layer(x, lp, wins[0]), None
            x, _ = jax.lax.scan(layer, x, layers)
        else:
            grouped = jax.tree.map(
                lambda a: a.reshape(c.num_layers // period, period,
                                    *a.shape[1:]), layers)

            def layer(x, lps):
                for j in range(period):
                    lp = jax.tree.map(lambda a, j=j: a[j], lps)
                    x = one_layer(x, lp, wins[j])
                return x, None
            x, _ = jax.lax.scan(layer, x, grouped)
        x = _norm(x, final_norm, c)
        return _soft_cap(mm(x, head).astype(jnp.float32),
                         c.final_softcap)                    # [B, Tl, V]

    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(None, "sp")),
        out_specs=P(None, "sp", None), check_vma=False)
    return sharded(params["layers"], params["embed"], head,
                   params["final_norm"], token_ids)
