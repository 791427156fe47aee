"""Shared test fixtures: build quantized pools from dense per-seq KV."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.ops.quant import encode_for_pool, dequantize_kv, kv_storage_dtype, quantize_kv


def build_pools(keys, values, block_size, num_slots, kv_dtype, seed_tables=True):
    """Pack per-seq dense KV ([L_i, H, D] each) into quantized pools.

    Returns (k_pool, v_pool, k_scale, v_scale, block_table, seq_lens,
    k_deq, v_deq) where *_deq are the dequantized values actually stored —
    the ground truth for attention comparisons.
    """
    num_kv_heads, head_dim = keys[0].shape[1:]
    max_blocks = max(-(-k.shape[0] // block_size) for k in keys)
    B = len(keys)
    pack = 2 if kv_dtype == KVDtype.INT4 else 1
    # K pool is TRANSPOSED ("kT", r3): [S, D/pack, Hkv*bs]
    k_pool = np.zeros((num_slots, head_dim // pack, num_kv_heads * block_size),
                      dtype=kv_storage_dtype(kv_dtype))
    v_pool = np.zeros((num_slots, num_kv_heads, block_size, head_dim // pack),
                      dtype=kv_storage_dtype(kv_dtype))
    # flat kT-order scale pools [S, 1, Hkv*bs]
    k_scale = np.ones((num_slots, 1, num_kv_heads * block_size), np.float32)
    v_scale = np.ones_like(k_scale)
    table = np.zeros((B, max_blocks), np.int32)
    lens = np.array([k.shape[0] for k in keys], np.int32)
    k_deq, v_deq = [], []

    # scatter blocks to non-contiguous slots to exercise the table
    rng = np.random.RandomState(0)
    free = list(rng.permutation(num_slots)) if seed_tables else list(range(num_slots))
    for b, (k, v) in enumerate(zip(keys, values)):
        L = k.shape[0]
        nb = -(-L // block_size)
        pad = nb * block_size - L
        kp = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
        kq, ks = quantize_kv(kp, kv_dtype)
        vq, vs = quantize_kv(vp, kv_dtype)
        k_deq.append(dequantize_kv(kq, ks, kv_dtype)[:L])
        v_deq.append(dequantize_kv(vq, vs, kv_dtype)[:L])
        for i in range(nb):
            slot = free.pop()
            table[b, i] = slot
            sl = slice(i * block_size, (i + 1) * block_size)
            # kT: encoded rows [bs, Hkv, Dp] -> [Dp, Hkv, bs] -> [Dp, Hkv*bs]
            kt = np.asarray(encode_for_pool(kq[sl], kv_dtype)).transpose(2, 1, 0)
            k_pool[slot] = kt.reshape(kt.shape[0], -1)
            v_pool[slot] = np.asarray(
                encode_for_pool(vq[sl], kv_dtype)).transpose(1, 0, 2)
            k_scale[slot, 0] = np.asarray(ks[sl, :, 0]).T.reshape(-1)
            v_scale[slot, 0] = np.asarray(vs[sl, :, 0]).T.reshape(-1)
    return (jnp.asarray(k_pool), jnp.asarray(v_pool), jnp.asarray(k_scale),
            jnp.asarray(v_scale), jnp.asarray(table), jnp.asarray(lens),
            k_deq, v_deq)


def dense_attention(q, k, v, sm_scale=None, causal=False, q_start=0):
    """Naive attention ground truth. q: [T, Hq, D], k/v: [L, Hkv, D]."""
    T, Hq, D = q.shape
    L, Hkv, _ = k.shape
    g = Hq // Hkv
    if sm_scale is None:
        sm_scale = D**-0.5
    qf = q.astype(jnp.float32).reshape(T, Hkv, g, D)
    s = jnp.einsum("thgd,lhd->hgtl", qf, k.astype(jnp.float32)) * sm_scale
    if causal:
        qpos = q_start + jnp.arange(T)
        mask = qpos[:, None] >= jnp.arange(L)[None, :]
        s = jnp.where(mask[None, None], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("hgtl,lhd->thgd", w, v.astype(jnp.float32))
    return out.reshape(T, Hq, D)
