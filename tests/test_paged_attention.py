"""Paged attention: reference vs naive dense, Pallas vs reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.ops.paged_attention import paged_attention
from cxl_speckv_tpu.ops.paged_attention_ref import (
    paged_attention_ref,
    prefill_attention_ref,
)

from helpers import build_pools, dense_attention

BLOCK = 8
HQ, HKV, D = 4, 2, 64


def setup(kv_dtype, lens=(5, 17, 32), seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2 * len(lens) + 1)
    keys = [jax.random.normal(ks[2 * i], (L, HKV, D)) for i, L in enumerate(lens)]
    vals = [jax.random.normal(ks[2 * i + 1], (L, HKV, D)) for i, L in enumerate(lens)]
    pools = build_pools(keys, vals, BLOCK, num_slots=32, kv_dtype=kv_dtype)
    q = jax.random.normal(ks[-1], (len(lens), HQ, D))
    return q, pools


@pytest.mark.parametrize("dt", [KVDtype.BF16, KVDtype.INT8, KVDtype.INT4, KVDtype.FP8])
def test_ref_matches_dense(dt):
    q, (kp, vp, ks, vs, table, lens, k_deq, v_deq) = setup(dt)
    out = paged_attention_ref(q, kp, vp, ks, vs, table, lens, dt)
    for b in range(len(lens)):
        want = dense_attention(q[b][None], k_deq[b], v_deq[b])
        np.testing.assert_allclose(np.asarray(out[b]), np.asarray(want[0]),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("dt", [KVDtype.BF16, KVDtype.INT8, KVDtype.INT4, KVDtype.FP8])
def test_pallas_matches_ref(dt):
    q, (kp, vp, ks, vs, table, lens, _, _) = setup(dt)
    want = paged_attention_ref(q, kp, vp, ks, vs, table, lens, dt)
    got = paged_attention(q, kp, vp, ks, vs, table, lens, dt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_single_block_seq():
    q, (kp, vp, ks, vs, table, lens, _, _) = setup(KVDtype.INT8, lens=(3,))
    want = paged_attention_ref(q, kp, vp, ks, vs, table, lens, KVDtype.INT8)
    got = paged_attention(q, kp, vp, ks, vs, table, lens, KVDtype.INT8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_mha_group1():
    # num_q_heads == num_kv_heads (group=1)
    lens = (9, 24)
    ksplit = jax.random.split(jax.random.PRNGKey(7), 5)
    keys = [jax.random.normal(ksplit[i], (L, HQ, D)) for i, L in enumerate(lens)]
    vals = [jax.random.normal(ksplit[i + 2], (L, HQ, D)) for i, L in enumerate(lens)]
    pools = build_pools(keys, vals, BLOCK, 16, KVDtype.INT8)
    kp, vp, ks, vs, table, seq_lens, _, _ = pools
    q = jax.random.normal(ksplit[4], (2, HQ, D))
    want = paged_attention_ref(q, kp, vp, ks, vs, table, seq_lens, KVDtype.INT8)
    got = paged_attention(q, kp, vp, ks, vs, table, seq_lens, KVDtype.INT8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_prefill_causal_no_context():
    T = 12
    kk = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kk[0], (T, HQ, D))
    k = jax.random.normal(kk[1], (T, HKV, D))
    v = jax.random.normal(kk[2], (T, HKV, D))
    out = prefill_attention_ref(q, k, v, start_pos=0)
    want = dense_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_prefill_with_pool_context():
    # chunk of 6 tokens arriving after 10 context tokens already in the pool
    ctx_len, T = 10, 6
    dt = KVDtype.INT8
    kk = jax.random.split(jax.random.PRNGKey(4), 7)
    k_ctx = jax.random.normal(kk[0], (ctx_len, HKV, D))
    v_ctx = jax.random.normal(kk[1], (ctx_len, HKV, D))
    kp, vp, ks, vs, table, _, k_deq, v_deq = build_pools(
        [k_ctx], [v_ctx], BLOCK, 8, dt)
    q = jax.random.normal(kk[2], (T, HQ, D))
    k_new = jax.random.normal(kk[3], (T, HKV, D))
    v_new = jax.random.normal(kk[4], (T, HKV, D))
    out = prefill_attention_ref(
        q, k_new, v_new, start_pos=ctx_len,
        k_pool=kp, v_pool=vp, k_scale=ks, v_scale=vs,
        block_table_row=table[0], kv_dtype=dt)
    k_all = jnp.concatenate([k_deq[0], k_new.astype(jnp.float32)])
    v_all = jnp.concatenate([v_deq[0], v_new.astype(jnp.float32)])
    want = dense_attention(q, k_all, v_all, causal=True, q_start=ctx_len)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dt", [KVDtype.BF16, KVDtype.INT8, KVDtype.INT4, KVDtype.FP8])
def test_chunk_kernel_matches_ref(dt):
    """Pallas chunk kernel (prefill/verify path) vs the jnp streamed
    reference, across context lengths incl. zero-context lanes."""
    from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention
    from cxl_speckv_tpu.ops.chunk_attention_pallas import (
        paged_chunk_attention_pallas,
    )

    T = 8
    q, (kp, vp, ks, vs, table, lens, _, _) = setup(dt, lens=(5, 17, 32))
    B = table.shape[0]
    rng = jax.random.split(jax.random.PRNGKey(9), 3)
    qc = jax.random.normal(rng[0], (B, T, HQ, D))
    kn = jax.random.normal(rng[1], (B, T, HKV, D))
    vn = jax.random.normal(rng[2], (B, T, HKV, D))
    start = jnp.asarray([5, 0, 32], jnp.int32)  # incl. zero context
    want = paged_chunk_attention(qc, kn, vn, kp, vp, ks, vs, table, start, dt)
    got = paged_chunk_attention_pallas(qc, kn, vn, kp, vp, ks, vs, table,
                                       start, dt, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_chunk_kernel_group1():
    from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention
    from cxl_speckv_tpu.ops.chunk_attention_pallas import (
        paged_chunk_attention_pallas,
    )

    T, H = 5, 2
    ks_ = jax.random.split(jax.random.PRNGKey(3), 5)
    keys = [jax.random.normal(ks_[0], (20, H, D))]
    vals = [jax.random.normal(ks_[1], (20, H, D))]
    from helpers import build_pools
    kp, vp, kss, vss, table, lens, _, _ = build_pools(keys, vals, BLOCK, 16,
                                                      KVDtype.INT8)
    qc = jax.random.normal(ks_[2], (1, T, H, D))
    kn = jax.random.normal(ks_[3], (1, T, H, D))
    vn = jax.random.normal(ks_[4], (1, T, H, D))
    start = jnp.asarray([20], jnp.int32)
    want = paged_chunk_attention(qc, kn, vn, kp, vp, kss, vss, table, start,
                                 KVDtype.INT8)
    got = paged_chunk_attention_pallas(qc, kn, vn, kp, vp, kss, vss, table,
                                       start, KVDtype.INT8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("window", [None, 24])
def test_chunk_kernel_tiled_fresh_matches_ref(window, monkeypatch):
    """Wide chunks switch the fresh-chunk part to the per-head x
    column-tile shape (r5 — the full score matrix [rows, g_h*T] blew
    Mosaic's 16 MB scoped VMEM at prefill_chunk=256 on v5e). Pin the
    tiled shape against the jnp reference by forcing the threshold to 0
    at a small T (distinct from other tests' shapes so jit retraces),
    with and without a sliding window."""
    import cxl_speckv_tpu.ops.chunk_attention_pallas as cap
    from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention

    monkeypatch.setattr(cap, "_TILED_FRESH_MIN_BYTES", 0)
    T = 48   # tg = T*G = 96 (sublane-aligned), ct picks 16
    q, (kp, vp, ks, vs, table, lens, _, _) = setup(
        KVDtype.INT8, lens=(5, 17, 31), seed=4)
    B = table.shape[0]
    rng = jax.random.split(jax.random.PRNGKey(11), 3)
    qc = jax.random.normal(rng[0], (B, T, HQ, D))
    kn = jax.random.normal(rng[1], (B, T, HKV, D))
    vn = jax.random.normal(rng[2], (B, T, HKV, D))
    start = jnp.asarray([5, 0, 31], jnp.int32)
    want = paged_chunk_attention(qc, kn, vn, kp, vp, ks, vs, table, start,
                                 KVDtype.INT8, window=window)
    got = cap.paged_chunk_attention_pallas(
        qc, kn, vn, kp, vp, ks, vs, table, start, KVDtype.INT8,
        interpret=True, window=window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("window,with_sinks", [(None, False), (24, False),
                                               (None, True)])
def test_chunk_kernel_row_tiled_matches_ref(window, with_sinks, monkeypatch):
    """Grid-level query-row tiling (r5): chunks whose q rows exceed
    _ROWS_PER_GRID_TILE split the token range over an extra grid axis
    (per-step VMEM blew Mosaic's 16 MB scoped limit at prefill_chunk=256
    on v5e). Force a 3-way tile at small T and pin against the jnp
    reference — plain, windowed, and with GPT-OSS sink logits (the
    operand whose row layout the tiling reorders)."""
    import cxl_speckv_tpu.ops.chunk_attention_pallas as cap
    from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention

    monkeypatch.setattr(cap, "_ROWS_PER_GRID_TILE", 64)
    monkeypatch.setattr(cap, "_TILED_FRESH_MIN_BYTES", 0)
    T = 48   # rows_full = 192 -> n_tt = 3 (Tt = 16, rows 64)
    q, (kp, vp, ks, vs, table, lens, _, _) = setup(
        KVDtype.INT8, lens=(6, 18, 30), seed=6)
    B = table.shape[0]
    rng = jax.random.split(jax.random.PRNGKey(13), 4)
    qc = jax.random.normal(rng[0], (B, T, HQ, D))
    kn = jax.random.normal(rng[1], (B, T, HKV, D))
    vn = jax.random.normal(rng[2], (B, T, HKV, D))
    sinks = (0.5 * jax.random.normal(rng[3], (HQ,)) if with_sinks else None)
    start = jnp.asarray([6, 0, 30], jnp.int32)
    want = paged_chunk_attention(qc, kn, vn, kp, vp, ks, vs, table, start,
                                 KVDtype.INT8, window=window, sinks=sinks)
    got = cap.paged_chunk_attention_pallas(
        qc, kn, vn, kp, vp, ks, vs, table, start, KVDtype.INT8,
        interpret=True, window=window, sinks=sinks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("sid,uni", [(0, KVDtype.INT8), (1, KVDtype.FP8)])
def test_mixed8_kernel_matches_uniform(sid, uni):
    """MIXED8 (per-layer scheme id as data) must equal the uniform-scheme
    program whose scheme the id selects — decode kernel, ref, and the
    chunk kernel."""
    import jax.numpy as jnp

    from cxl_speckv_tpu.ops.chunk_attention import paged_chunk_attention
    from cxl_speckv_tpu.ops.chunk_attention_pallas import (
        paged_chunk_attention_pallas,
    )

    q, (kp, vp, ks, vs, table, lens, _, _) = setup(uni)
    sid_arr = jnp.int32(sid)
    got = paged_attention(q, kp, vp, ks, vs, table, lens, KVDtype.MIXED8,
                          scheme_id=sid_arr, interpret=True)
    want = paged_attention(q, kp, vp, ks, vs, table, lens, uni, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    gr = paged_attention_ref(q, kp, vp, ks, vs, table, lens, KVDtype.MIXED8,
                             scheme_id=sid_arr)
    wr = paged_attention_ref(q, kp, vp, ks, vs, table, lens, uni)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr), rtol=1e-6)

    T = 8
    B = table.shape[0]
    rng = jax.random.split(jax.random.PRNGKey(5), 3)
    qc = jax.random.normal(rng[0], (B, T, HQ, D))
    kn = jax.random.normal(rng[1], (B, T, HKV, D))
    vn = jax.random.normal(rng[2], (B, T, HKV, D))
    start = jnp.asarray([5, 0, 32], jnp.int32)
    gc = paged_chunk_attention_pallas(qc, kn, vn, kp, vp, ks, vs, table,
                                      start, KVDtype.MIXED8,
                                      scheme_id=sid_arr, interpret=True)
    wc = paged_chunk_attention_pallas(qc, kn, vn, kp, vp, ks, vs, table,
                                      start, uni, interpret=True)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(wc), rtol=1e-6)
    gj = paged_chunk_attention(qc, kn, vn, kp, vp, ks, vs, table, start,
                               KVDtype.MIXED8, scheme_id=sid_arr)
    wj = paged_chunk_attention(qc, kn, vn, kp, vp, ks, vs, table, start, uni)
    np.testing.assert_allclose(np.asarray(gj), np.asarray(wj), rtol=1e-6)
