"""Pallas fused-dequant paged attention (decode path).

The flagship kernel (SURVEY.md section 7.3 "hard parts"): streams quantized
KV blocks HBM -> VMEM through the block table, dequantizes in-register, and
runs online-softmax (flash) attention. Compressed KV is never materialized at
full precision — the TPU-native analog of the FPGA decompressing on the
datapath between CXL pool and HBM (`hardware/rtl/kv_decompress.v`), fused one
level further into the attention matmul itself.

Design (r3 "v2": transposed-K layout — measured 1.8x over the r2 kernel):
- K pool layout is [num_slots, D/pack, Hkv*block_size] ("kT": head_dim on
  sublanes, head-major token columns on lanes). Both attention matmuls are
  then MXU-NATIVE contractions with no operand transposes:
      QK^T: q [rows, D] @ kT [D, cols]      (contract lanes x sublanes)
      PV:   p [rows, cols] @ v [cols, D]    (contract lanes x sublanes)
  The r2 kernel stored K token-major ([S, Hkv, bs, D]) and paid a Mosaic
  relayout of every K tile for the (1,1)-contraction QK — measured ~40% of
  kernel time at the bench geometry (scripts/kernel_anatomy.py; the
  score-transposed form "matmulT" was measured worse, which is why the
  LAYOUT moves instead of the math).
- V pool stays token-major [num_slots, Hkv, block_size, D/pack] (PV is
  already native on it).
- Scales fold POST-matmul as per-column vectors: s *= ks[None, :] after
  QK^T and p *= vs[None, :] before PV — a [1, cols] VPU op instead of
  scaling whole K/V tiles pre-matmul.
- INT4 K packs along the SUBLANE axis of kT (row r holds elements r and
  r + D/2 of a token column — the same half-split pairing as the lane
  packing, so `encode_for_pool` rows drop straight into kT rows); unpack
  is 32-bit shifts + a sublane concat, full-lane throughout. INT4 V keeps
  the lane half-split (a clean per-token row write at append).
- Grid (batch, block_group): `pages_per_step` blocks ride separate
  BlockSpecs per step; the block table + seq lens ride scalar prefetch
  (`PrefetchScalarGridSpec`) so index maps resolve physical slots before
  the pipeline DMAs them (the device-side page walk, `hardware/rtl/atu.v`).
  Index maps clamp at the lane's last real block so overshoot DMAs elide.
- Online softmax updates PER PAGE in VMEM scratch across the sequential
  grid — flash decoding in one pass.

Measured bound (scripts/kernel_anatomy.py, r3): at the bench geometry this
kernel sits ON the DMA-pipeline floor — a fetch-only kernel with identical
specs costs the same — so further wins need fewer/bigger blocks, not math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.ops.pallas_utils import interpret_mode

NEG_INF = -1e30


def kt_pool_shape(num_slots: int, num_kv_heads: int, block_size: int,
                  head_dim: int, kv_dtype: KVDtype) -> tuple[int, int, int]:
    """Shape of the transposed K pool for one layer."""
    pack = 2 if kv_dtype == KVDtype.INT4 else 1
    return (num_slots, head_dim // pack, num_kv_heads * block_size)


def store_to_kt(blk: jax.Array) -> jax.Array:
    """Store-layout K blocks [..., Hkv, bs, D/pack] -> kT pool layout
    [..., D/pack, Hkv*bs]. The INT4 half-split byte pairing is
    layout-invariant (lane i of a token row holds elements (i, i+D/2),
    which becomes sublane i of the token's kT column)."""
    a = jnp.moveaxis(blk, -1, -3)             # [..., D/pack, Hkv, bs]
    return a.reshape(*a.shape[:-2], -1)       # [..., D/pack, Hkv*bs]


def kt_to_store(kt: jax.Array, num_kv_heads: int) -> jax.Array:
    """Inverse of `store_to_kt`: [..., D/pack, Hkv*bs] -> [..., Hkv, bs, D/pack]."""
    a = kt.reshape(*kt.shape[:-1], num_kv_heads, -1)   # [..., Dp, Hkv, bs]
    return jnp.moveaxis(a, -3, -1)                     # [..., Hkv, bs, Dp]


def _dequant_tile(raw: jax.Array, kv_dtype: KVDtype, head_dim: int,
                  sid=None, out_dtype=jnp.float32, axis: int = -1) -> jax.Array:
    """Raw quantized tile -> `out_dtype` values (scales separate). All
    stored values are exactly representable in bfloat16 (int8/int4
    integers, e4m3 floats), so out_dtype=bfloat16 loses nothing here —
    rounding enters only at the scale multiply. INT4 unpacks along `axis`
    (-1 for token-major V tiles, -2/0 for kT sublane-packed tiles). MIXED8:
    `sid` (scalar read from SMEM) selects the byte interpretation — 0 =
    INT8, 1 = FP8 (per-layer mixed pools)."""
    if kv_dtype == KVDtype.MIXED8:
        i8 = raw.astype(out_dtype)
        f8 = jax.lax.bitcast_convert_type(raw, jnp.float8_e4m3fn).astype(out_dtype)
        f8 = jnp.where(jnp.isnan(f8), 0.0, f8)
        return jnp.where(sid == 0, i8, f8)
    if kv_dtype == KVDtype.INT4:
        # Mosaic has no 8-bit shifts: sign-extend nibbles via 32-bit shifts
        r = raw.astype(jnp.int32)
        lo = (r << 28) >> 28
        hi = (r << 24) >> 28
        raw = jnp.concatenate([lo, hi], axis=axis)  # half-split packing
    elif kv_dtype == KVDtype.FP8 and raw.dtype == jnp.int8:
        # pool stores e4m3 bits in int8 bytes; reinterpret in-register.
        # Foreign-scheme bytes (guard slot, pre-switch blocks) can bitcast
        # to e4m3 NaN — sanitize so masked junk stays finite.
        f = jax.lax.bitcast_convert_type(raw, jnp.float8_e4m3fn).astype(out_dtype)
        return jnp.where(jnp.isnan(f), 0.0, f)
    return raw.astype(out_dtype)


def _decode_kernel(
    table_ref,   # [B, max_blocks] int32 (SMEM)
    lens_ref,    # [B] int32 (SMEM)
    q_ref,       # [1, Hkv, G, D]
    *rest,       # ppb x (kT, v, ks, vs) block refs, o_ref, 3 scratch refs
    kv_dtype: KVDtype,
    block_size: int,
    head_dim: int,
    num_kv_heads: int,
    group: int,
    ppb: int,
    sm_scale: float,
    compute_dtype=jnp.float32,
    sid_ref=None,   # [1] int32 SMEM — MIXED8 per-layer scheme id
    window=None,    # static sliding window (positions < seq_len - window masked)
    softcap=None,   # static tanh score cap (Gemma family)
    has_sinks=False,  # GPT-OSS learned sink logits operand present
):
    kt_refs = rest[0:ppb]
    v_refs = rest[ppb:2 * ppb]
    ks_refs = rest[2 * ppb:3 * ppb]
    vs_refs = rest[3 * ppb:4 * ppb]
    rest = rest[4 * ppb:]
    sinks_ref = None
    if has_sinks:
        sinks_ref, rest = rest[0], rest[1:]
    o_ref, acc_ref, m_ref, l_ref = rest

    b = pl.program_id(0)
    i = pl.program_id(1)
    n_steps = pl.num_programs(1)
    seq_len = lens_ref[b]
    sid = sid_ref[0] if sid_ref is not None else None
    G = group
    bs = block_size
    rows = num_kv_heads * G
    cols = num_kv_heads * bs

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = i * ppb * block_size < seq_len
    if window is not None:
        # steps wholly below the window's lower edge contribute nothing
        run = run & ((i + 1) * ppb * block_size > seq_len - window)

    @pl.when(run)
    def _compute():
        # One pass per PAGE: q [rows, D] against this page's kT [D, cols]
        # and v [cols, D] in MXU-native contractions. Off-diagonal
        # (query-head != kv-head) score entries mask to NEG_INF; exp
        # underflows them to exactly 0 so PV sums only each head's own
        # columns — Hkv-fold redundant FLOPs, but the kernel is
        # bandwidth-bound and big MXU ops beat Hkv tiny ones.
        q = q_ref[0].reshape(rows, head_dim).astype(compute_dtype)
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        r_head = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0) // G
        c_head = c_idx // bs
        head_ok = c_head == r_head

        for j in range(ppb):
            kT = _dequant_tile(kt_refs[j][0], kv_dtype, head_dim, sid,
                               out_dtype=compute_dtype, axis=0)  # [D, cols]
            s = jax.lax.dot_general(
                q, kT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)              # [rows, cols]
            # K scales fold per column post-matmul:
            # q . (k * s) == (q . k) * s — a [1, cols] VPU op; the flat
            # scale pool's tile IS that vector (no in-kernel shape cast)
            ksf = ks_refs[j][0]
            s = s * ksf * sm_scale
            if softcap is not None:
                s = softcap * jnp.tanh(s / softcap)

            pos = (i * ppb + j) * bs + c_idx % bs
            ok = head_ok & (pos < seq_len)
            if window is not None:
                ok = ok & (pos >= seq_len - window)
            s = jnp.where(ok, s, NEG_INF)

            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            # V scales fold into the weights pre-PV (same post-matmul trick)
            vsf = vs_refs[j][0]
            v = _dequant_tile(v_refs[j][0], kv_dtype, head_dim, sid,
                              out_dtype=compute_dtype)  # [Hkv, bs, D]
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                (p * vsf).astype(compute_dtype),
                v.reshape(cols, head_dim),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:] = m_new

    @pl.when(i == n_steps - 1)
    def _finalize():
        acc, l = acc_ref[:], l_ref[:]
        if has_sinks:
            # GPT-OSS sink: one extra logit per head with no value vector —
            # joins the global max and the denominator at finalize
            sk = sinks_ref[:]                              # [rows, 1] f32
            m_prev = m_ref[:]
            m_fin = jnp.maximum(m_prev, sk)
            a2 = jnp.exp(m_prev - m_fin)
            l = l * a2 + jnp.exp(sk - m_fin)
            acc = acc * a2
        # max(l, tiny) so a lane with seq_len == 0 (no _compute ran) yields
        # zeros instead of NaN — flash-decoding convention for empty rows
        out = acc / jnp.maximum(l, 1e-30)
        o_ref[0] = out.reshape(num_kv_heads, G, head_dim).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kv_dtype", "sm_scale", "interpret",
                              "pages_per_step", "compute_dtype", "window",
                              "softcap")
)
def paged_attention(
    q: jax.Array,              # [B, num_q_heads, head_dim]
    k_pool: jax.Array,         # [num_slots, D/pack, Hkv*block_size] (kT)
    v_pool: jax.Array,         # [num_slots, H_kv, block_size, D/pack]
    k_scale: jax.Array,        # [num_slots, 1, Hkv*block_size] f32 (flat)
    v_scale: jax.Array,
    block_table: jax.Array,    # [B, max_blocks] int32, clamped >= 0
    seq_lens: jax.Array,       # [B] int32
    kv_dtype: KVDtype,
    sm_scale: float | None = None,
    interpret: bool | None = None,
    scheme_id: jax.Array | None = None,   # MIXED8: 0=INT8 / 1=FP8 this call
    pages_per_step: int | None = None,
    compute_dtype=jnp.float32,  # matmul operand dtype; bf16 = native MXU
    window: int | None = None,  # static sliding window (Mistral family)
    softcap: float | None = None,  # static tanh score cap (Gemma family)
    sinks: jax.Array | None = None,  # [Hq] learned sink logits (GPT-OSS)
) -> jax.Array:
    B, num_q_heads, head_dim = q.shape
    num_slots, num_kv_heads, block_size, _ = v_pool.shape
    max_blocks = block_table.shape[1]
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    if interpret is None:
        interpret = interpret_mode()
    pack = 2 if kv_dtype == KVDtype.INT4 else 1
    mixed = kv_dtype == KVDtype.MIXED8
    ppb = pages_per_step or min(8, max_blocks)
    while max_blocks % ppb:
        ppb -= 1
    n_steps = max_blocks // ppb
    cols = num_kv_heads * block_size

    base = functools.partial(
        _decode_kernel,
        kv_dtype=kv_dtype,
        block_size=block_size,
        head_dim=head_dim,
        num_kv_heads=num_kv_heads,
        group=group,
        ppb=ppb,
        sm_scale=float(sm_scale),
        compute_dtype=compute_dtype,
        window=window,
        softcap=softcap,
        has_sinks=sinks is not None,
    )
    if mixed:
        # third scalar-prefetch operand carries the per-layer scheme id
        def kernel(table_ref, lens_ref, sid_ref, *rest):
            base(table_ref, lens_ref, *rest, sid_ref=sid_ref)
    else:
        kernel = base

    # group-major q view: [B, Hkv, G, D] — (G, D) are the tiling dims
    q4 = q.reshape(B, num_kv_heads, group, head_dim)

    def kv_index(j, rank=4):
        def f(b, i, t, l, *_):
            # clamp to the lane's last real block: grid steps past seq_len
            # re-address it, so their DMAs are elided (no dead traffic for
            # short sequences in a wide table)
            last = jnp.maximum((l[b] - 1) // block_size, 0)
            idx = i * ppb + j
            if window is not None:
                # sliding window: steps wholly below the window re-address
                # the first in-window block, eliding their DMAs too
                first = jnp.maximum((l[b] - window) // block_size, 0)
                idx = jnp.maximum(idx, first)
            slot = t[b, jnp.minimum(idx, last)]
            return (slot,) + (0,) * (rank - 1)
        return f

    kt_spec = [pl.BlockSpec((1, head_dim // pack, cols), kv_index(j, rank=3))
               for j in range(ppb)]
    v_spec = [pl.BlockSpec((1, num_kv_heads, block_size, head_dim // pack),
                           kv_index(j)) for j in range(ppb)]
    sink_spec = ([pl.BlockSpec((num_kv_heads * group, 1),
                               lambda b, i, *_: (0, 0))]
                 if sinks is not None else [])
    # scales ride FLAT head-major columns [S, 1, Hkv*bs] matching kT, so
    # each page's per-column scale vector is one natural [1, cols] tile
    sc_spec = [pl.BlockSpec((1, 1, cols), kv_index(j, rank=3))
               for j in range(ppb)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if mixed else 2,
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((1, num_kv_heads, group, head_dim),
                         lambda b, i, *_: (b, 0, 0, 0)),
            *kt_spec, *v_spec, *sc_spec, *sc_spec, *sink_spec,
        ],
        out_specs=pl.BlockSpec((1, num_kv_heads, group, head_dim),
                               lambda b, i, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((num_kv_heads * group, head_dim), jnp.float32),
            pltpu.VMEM((num_kv_heads * group, 1), jnp.float32),
            pltpu.VMEM((num_kv_heads * group, 1), jnp.float32),
        ],
    )

    scalars = (block_table, seq_lens)
    if mixed:
        scalars += (jnp.reshape(scheme_id, (1,)).astype(jnp.int32),)
    operands = (q4,) + (k_pool,) * ppb + (v_pool,) * ppb \
        + (k_scale,) * ppb + (v_scale,) * ppb
    if sinks is not None:
        operands += (sinks.reshape(num_kv_heads * group, 1)
                     .astype(jnp.float32),)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, num_kv_heads, group, head_dim), q.dtype),
        interpret=interpret,
    )(*scalars, *operands)
    return out.reshape(B, num_q_heads, head_dim)
