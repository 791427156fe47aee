"""Streamed attention over HOST-resident quantized KV context.

The capability that lifts the "sequence must fit HBM" limit (BASELINE
config 3, 128k-context; reference premise `README.md:16-19`: serve KV far
larger than fast memory): context blocks stay in the host tier and are
STREAMED through the device wave-by-wave inside the attention itself —
an online-softmax scan whose block fetch reads the pinned-host store
directly (`runtime/hoststore.StoreOps.fetch_layer`), so peak HBM use is
one wave regardless of context length.

This is the logical extreme of the reference's tiering: rather than
migrating blocks into the HBM pool before attending (the pooled serving
path), the attention datapath itself reaches into the pool — the analog of
the FPGA decompressor sitting on the CXL->HBM datapath
(`hardware/rtl/kv_decompress.v`) with the HBM hop removed.

Bandwidth note: every streamed token pays host-link bandwidth for the whole
context (that IS the tiering trade; HBM-resident serving remains the fast
path for everything that fits). Waves are sized so each host DMA moves
wave * Hkv * bs * D bytes per layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.ops.paged_attention_ref import _dequant_block

NEG_INF = -1e30


def _make_wave_attend(qg, num_kv_heads, wave, block_size, head_dim,
                      kv_dtype, start_pos, sm_scale, window, softcap, T):
    """Shared online-softmax wave update used by both the host-fetching
    path (`stream_context_attention`) and the staged device-slab path
    (`stream_context_attention_slab`). Identical accumulate order keeps the
    two paths FP-identical for the same wave sequence."""

    def attend(w, acc, slab):
        m_acc, l_acc, o_acc = acc
        kblk, vblk, ksb, vsb = slab
        # [W, Hkv, bs, Dp] -> [Hkv, W*bs, D]
        kblk = _dequant_block(kblk, kv_dtype)
        vblk = _dequant_block(vblk, kv_dtype)
        kc = kblk.transpose(1, 0, 2, 3).reshape(num_kv_heads, wave * block_size, head_dim)
        vc = vblk.transpose(1, 0, 2, 3).reshape(num_kv_heads, wave * block_size, head_dim)
        ks = ksb.transpose(1, 0, 2).reshape(num_kv_heads, wave * block_size)
        vs = vsb.transpose(1, 0, 2).reshape(num_kv_heads, wave * block_size)

        s = jnp.einsum("thgd,hsd->hgts", qg, kc) * ks[:, None, None, :] * sm_scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        pos = w * wave * block_size + jnp.arange(wave * block_size)
        valid = pos[None, :] < start_pos                       # [1|T, S]
        if window is not None:
            # query t sits at absolute position start_pos + t
            t_idx = jnp.arange(T)
            valid = valid & (pos[None, :] > start_pos + t_idx[:, None] - window)
        s = jnp.where(valid[None, None], s, NEG_INF)

        m_new = jnp.maximum(m_acc, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_acc - m_new)
        l_acc = l_acc * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o_acc = o_acc * alpha + jnp.einsum(
            "hgts,hsd->hgtd", p * vs[:, None, None, :], vc)
        return (m_new, l_acc, o_acc)

    return attend


def stream_context_attention_slab(
    q: jax.Array,             # [T, Hq, D] fresh queries (rope applied)
    slab,                     # (k [Wb,Hkv,bs,Dp], v, ks [Wb,Hkv,bs], vs)
                              # DEVICE-resident staged context rows
    start_pos: jax.Array,     # scalar int32: pool tokens < start_pos are context
    kv_dtype: KVDtype,
    block_size: int,
    wave: int,
    sm_scale: float | None = None,
    window: int | None = None,
    softcap: float | None = None,
):
    """Online-softmax context attention over a PRE-STAGED device slab.

    The r4 staged-gather path (VERDICT r3 next-step #4): the host gathers
    happen once per LAYER GROUP outside the model math (measured ~5 ms per
    `compute_on` host op + ~1 ms per array on the v5e remote runtime —
    `scripts/hostop_probe.py` — so one fat gather beats per-wave fetches by
    the op-count ratio), and attention here runs the IDENTICAL wave loop as
    `stream_context_attention` over cheap device slices. Returns (m, l, o)
    accumulators for `merge_chunk_causal`."""
    T, num_q_heads, head_dim = q.shape
    num_kv_heads = slab[0].shape[1]
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    qg = q.reshape(T, num_kv_heads, group, head_dim).astype(jnp.float32)
    n_waves = slab[0].shape[0] // wave
    n_used = jnp.minimum(
        (start_pos + wave * block_size - 1) // (wave * block_size), n_waves)

    attend = _make_wave_attend(qg, num_kv_heads, wave, block_size, head_dim,
                               kv_dtype, start_pos, sm_scale, window,
                               softcap, T)

    def wave_step(w, acc):
        sl = tuple(jax.lax.dynamic_slice_in_dim(a, w * wave, wave, axis=0)
                   for a in slab)
        return attend(w, acc, sl)

    shape = (num_kv_heads, group, T)
    init = (
        jnp.full((*shape, 1), NEG_INF),
        jnp.zeros((*shape, 1)),
        jnp.zeros((*shape, head_dim)),
    )
    w0 = jnp.int32(0)
    if window is not None:
        w0 = jnp.clip((start_pos - window) // (wave * block_size), 0, n_used)
    return jax.lax.fori_loop(w0, n_used, wave_step, init)


def stream_context_attention(
    q: jax.Array,             # [T, Hq, D] fresh queries (rope applied), f32-able
    stores,                   # (k, v, ks, vs) flat-row host store arrays
    host_row: jax.Array,      # [max_blocks_padded] int32 store SLOTS (guard-padded)
    start_pos: jax.Array,     # scalar int32: pool tokens < start_pos are context
    layer: jax.Array,         # scalar int32: current layer (inside the layer scan)
    kv_dtype: KVDtype,
    ops,                      # StoreOps
    num_layers: int,
    block_size: int,
    max_blocks: int,
    wave: int = 4,
    sm_scale: float | None = None,
    window: int | None = None,   # sliding window (Mistral family)
    softcap: float | None = None,  # tanh score cap (Gemma family)
    pre=None,                    # prefetched first-wave slab (pipelining)
    next_layer: jax.Array | None = None,  # prefetch target layer index
):
    """Online-softmax partial attention over host-resident context.

    Returns carried accumulators (m [Hkv, G, T, 1], l [Hkv, G, T, 1],
    o [Hkv, G, T, D]) for the caller to merge with in-chunk attention.

    Prefetch pipelining (r4, VERDICT r3 next-step #4): with `pre` (this
    layer's wave-0 slab, fetched during the PREVIOUS layer) and
    `next_layer`, each wave consumes the slab fetched one iteration ahead
    and issues the NEXT wave's host gather before the matmuls that hide
    it — the last wave prefetches `next_layer`'s wave 0. Returns
    ((m, l, o), next_pre) in this mode. Only for window-free models
    (a sliding window makes the first consumed wave index dynamic, which
    would desynchronize the carried slab)."""
    T, num_q_heads, head_dim = q.shape
    num_kv_heads = stores[0].shape[1]
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    qg = q.reshape(T, num_kv_heads, group, head_dim).astype(jnp.float32)

    n_waves = -(-max_blocks // wave)
    # dynamic trip count: only waves overlapping real context run, so a
    # 128k-capable table costs nothing for short sequences
    n_used = jnp.minimum(
        (start_pos + wave * block_size - 1) // (wave * block_size), n_waves)

    def fetch(w, lyr):
        slots = jax.lax.dynamic_slice(host_row, (w * wave,), (wave,))
        return ops.fetch_layer(stores, slots, lyr, num_layers)

    attend = _make_wave_attend(qg, num_kv_heads, wave, block_size, head_dim,
                               kv_dtype, start_pos, sm_scale, window,
                               softcap, T)

    shape = (num_kv_heads, group, T)
    init = (
        jnp.full((*shape, 1), NEG_INF),
        jnp.zeros((*shape, 1)),
        jnp.zeros((*shape, head_dim)),
    )
    if pre is not None and next_layer is not None:
        assert window is None, "prefetch pipelining needs window-free layers"

        def wave_step(w, carry):
            acc, slab = carry
            # issue the NEXT gather before the matmuls that consume `slab`
            # — independent dataflow, so the host fetch can overlap them
            last = w + 1 >= n_used
            nslab = fetch(jnp.where(last, 0, w + 1),
                          jnp.where(last, next_layer, layer))
            return (attend(w, acc, slab), nslab)

        acc, next_pre = jax.lax.fori_loop(jnp.int32(0), n_used, wave_step,
                                          (init, pre))
        return acc, next_pre

    def wave_step(w, carry):
        return attend(w, carry, fetch(w, layer))

    w0 = jnp.int32(0)
    if window is not None:
        # waves wholly below the earliest query's window edge are skipped
        w0 = jnp.clip((start_pos - window) // (wave * block_size), 0, n_used)
    m_acc, l_acc, o_acc = jax.lax.fori_loop(w0, n_used, wave_step, init)
    return m_acc, l_acc, o_acc


def merge_chunk_causal(
    q: jax.Array,         # [T, Hq, D]
    k_new: jax.Array,     # [T, Hkv, D] (already quantize->dequantized)
    v_new: jax.Array,
    carry,                # (m, l, o) from stream_context_attention
    sm_scale: float | None = None,
    window: int | None = None,
    softcap: float | None = None,
    sinks: jax.Array | None = None,       # [Hq] learned sink logits (GPT-OSS)
):
    """Merge in-chunk causal attention into the streamed accumulators and
    finalize. Returns [T, Hq, D]."""
    T, num_q_heads, head_dim = q.shape
    num_kv_heads = k_new.shape[1]
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    m_acc, l_acc, o_acc = carry
    qg = q.reshape(T, num_kv_heads, group, head_dim).astype(jnp.float32)
    kf = k_new.astype(jnp.float32)
    vf = v_new.astype(jnp.float32)
    s = jnp.einsum("thgd,shd->hgts", qg, kf) * sm_scale
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    t_idx = jnp.arange(T)
    causal = t_idx[:, None] >= t_idx[None, :]
    if window is not None:
        causal = causal & (t_idx[:, None] - t_idx[None, :] < window)
    s = jnp.where(causal[None, None], s, NEG_INF)
    m_new = jnp.maximum(m_acc, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_acc - m_new)
    l_acc = l_acc * alpha + jnp.sum(p, axis=-1, keepdims=True)
    o_acc = o_acc * alpha + jnp.einsum("hgts,shd->hgtd", p, vf)
    if sinks is not None:
        sk = (sinks.reshape(num_kv_heads, group)
              .astype(jnp.float32)[:, :, None, None])
        m_fin = jnp.maximum(m_new, sk)
        a2 = jnp.exp(m_new - m_fin)
        l_acc = l_acc * a2 + jnp.exp(sk - m_fin)
        o_acc = o_acc * a2
    out = o_acc / jnp.maximum(l_acc, 1e-30)       # [Hkv, G, T, D]
    return out.transpose(2, 0, 1, 3).reshape(T, num_q_heads, head_dim).astype(q.dtype)
