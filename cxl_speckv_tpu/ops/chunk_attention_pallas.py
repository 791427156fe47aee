"""Pallas fused-dequant CHUNK attention (prefill / speculative verify).

The second half of the `kv_decompress.v` mapping (`hardware/rtl/
kv_decompress.v:5-165`): where `ops/paged_attention.py` covers the decode
path (one query token), this kernel covers multi-token chunks — batched
chunked prefill and speculative-decoding verification — streaming quantized
context blocks HBM -> VMEM through the block table and finishing with the
in-chunk causal part, all in one online-softmax pass.

Sharing the decode kernel's recipe is the point: the TRANSPOSED K pool
("kT", r3 — see ops/paged_attention.py) makes QK^T MXU-native, scales fold
POST-matmul as per-column vectors, operands are `compute_dtype` (bf16 =
native MXU rate; f32 available), softmax statistics and accumulators stay
f32 — one rounding behavior across decode and verify, so greedy
speculative decoding agrees with plain decoding on hardware.

Grid (B, head_groups, ctx_steps + 1): heads ride the grid in GROUPS of
g_h = max(1, 128 // block_size) so each kT context tile spans g_h*bs = 128
lanes — the Mosaic lane rule that a single-head tile (bs < 128 columns)
violates on real hardware (found by the r3 on-TPU spec check; interpret
mode does not enforce tiling). Rows are the group's queries laid out
head-major (r = h_local*T*G + t*G + g) and off-diagonal (query-head !=
kv-head) score entries mask to NEG_INF — the decode kernel's
block-diagonal trick at chunk scale. Context steps stream `pages_per_step`
blocks; index maps clamp at the sequence's last real context block so
trailing steps re-address it and their copies elide. The final grid step
folds in the fresh chunk KV (causal) and finalizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cxl_speckv_tpu.config import KVDtype
from cxl_speckv_tpu.ops.paged_attention import _dequant_tile
from cxl_speckv_tpu.ops.pallas_utils import interpret_mode

NEG_INF = -1e30

# Full-matrix fresh-chunk scores above this many bytes switch to the
# per-head x column-tile shape (see _chunk_and_finalize) — which also
# skips the (1 - 1/g_h) cross-head-masked share of the full matmul, so
# engage it as soon as alignment allows a meaningful score matrix.
# Tests lower it to pin tiled-vs-full parity at small shapes.
_TILED_FRESH_MIN_BYTES = 2 << 20

# Cap on q rows per grid step (r5): beyond this the kernel's per-step
# VMEM (unrolled context score temporaries + fresh q/acc) exceeds
# Mosaic's 16 MB scoped limit (prefill_chunk=256 measured 18.7 MB on
# v5e); the wrapper splits the chunk's token range over an extra grid
# axis to stay at the envelope prefill_chunk=128 proved out.
_ROWS_PER_GRID_TILE = 2048


def _chunk_kernel(
    # scalar prefetch
    table_ref,   # [B, max_blocks] int32 (SMEM)
    start_ref,   # [B] int32 — context length per lane (SMEM)
    # blocks
    q_ref,       # [1, 1, g_h*TG, D] this head-group's queries
    kn_ref,      # [1, 1, g_h*T, D] fresh keys (group), store-rounded,
                 # pre-flattened head-major on the host (an in-kernel
                 # [g_h, T, D] -> [g_h*T, D] reshape is not Mosaic-lowerable
                 # for sub-sublane T)
    vn_ref,      # [1, 1, g_h*T, D]
    *rest,       # ppb x (kT, v, ks, vs) context refs, o_ref, 3 scratch refs
    kv_dtype: KVDtype,
    block_size: int,
    head_dim: int,
    group: int,
    g_h: int,    # kv heads per grid step
    chunk_t: int,  # T (fresh tokens)
    ppb: int,
    sm_scale: float,
    compute_dtype=jnp.float32,
    sid_ref=None,   # [1] int32 SMEM — MIXED8 per-layer scheme id
    window=None,    # static sliding window (Mistral family)
    softcap=None,   # static tanh score cap (Gemma family)
    has_sinks=False,  # GPT-OSS learned sink logits operand present
    tt_count=1,  # query-row grid tiles (r5 — wide chunks; see wrapper)
):
    k_refs = rest[0:ppb]
    v_refs = rest[ppb:2 * ppb]
    ks_refs = rest[2 * ppb:3 * ppb]
    vs_refs = rest[3 * ppb:4 * ppb]
    rest = rest[4 * ppb:]
    sinks_ref = None
    if has_sinks:
        sinks_ref, rest = rest[0], rest[1:]
    o_ref, acc_ref, m_ref, l_ref = rest

    b = pl.program_id(0)
    hg = pl.program_id(1)
    if tt_count > 1:
        tt = pl.program_id(2)
        i = pl.program_id(3)
        nb = pl.num_programs(3)
    else:
        tt = 0       # static: the tile-offset terms below constant-fold,
        i = pl.program_id(2)     # keeping the untiled program unchanged
        nb = pl.num_programs(2)
    start = start_ref[b]
    sid = sid_ref[0] if sid_ref is not None else None
    bs = block_size
    T = chunk_t
    Tt = T // tt_count       # fresh tokens covered by this row tile
    tg = Tt * group          # per-head query rows in this tile
    rows = g_h * tg          # tile rows (r = h*tg + t_local*G + g)
    gcols = g_h * bs         # group-local context columns per page
    t0 = tt * Tt             # tile's first token, chunk-absolute

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = (i < nb - 1) & (i * ppb * block_size < start)
    if window is not None:
        # steps wholly below the EARLIEST query's window edge (row t=0 at
        # absolute position `start`) contribute nothing
        run = run & ((i + 1) * ppb * block_size > start - window)

    @pl.when(run)
    def _context():
        q = q_ref[0, 0].astype(compute_dtype)                 # [rows, D]
        r_head = jax.lax.broadcasted_iota(jnp.int32, (rows, gcols), 0) // tg
        c_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, gcols), 1)
        head_ok = c_idx // bs == r_head
        row_t = t0 + (jax.lax.broadcasted_iota(jnp.int32, (rows, gcols), 0)
                      % tg) // group

        for j in range(ppb):
            kT = _dequant_tile(k_refs[j][0], kv_dtype, head_dim, sid,
                               out_dtype=compute_dtype, axis=0)  # [D, gcols]
            s = jax.lax.dot_general(
                q, kT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [rows, gcols]
            # scales fold POST-matmul per column; the FLAT scale pool's
            # tile IS this group's [1, gcols] vector (no shape cast)
            ksf = ks_refs[j][0]
            s = s * ksf * sm_scale
            if softcap is not None:
                s = softcap * jnp.tanh(s / softcap)
            pos = (i * ppb + j) * bs + c_idx % bs
            ok = head_ok & (pos < start)
            if window is not None:
                # query row at absolute position start + row_t attends
                # positions in [start + row_t - window + 1, start + row_t]
                ok = ok & (pos + window > start + row_t)
            s = jnp.where(ok, s, NEG_INF)

            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            vsf = vs_refs[j][0]
            v = _dequant_tile(v_refs[j][0], kv_dtype, head_dim, sid,
                              out_dtype=compute_dtype)  # [g_h, bs, D]
            acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
                (p * vsf).astype(compute_dtype), v.reshape(gcols, head_dim),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[:] = m_new

    @pl.when(i == nb - 1)
    def _chunk_and_finalize():
        # Fresh-chunk KV enters the matmul in f32: the engine feeds
        # quantize->dequantized values (exact int x f32 scale), and the
        # POOL path multiplies raw ints (bf16-exact) folding the f32 scale
        # post-matmul — i.e. the context scores carry NO bf16 rounding.
        # Rounding the fresh values to bf16 here made verify diverge from
        # decode on the newest tokens (measured on hardware: spec greedy
        # agreement 0.82 vs 0.99). q still rounds through compute_dtype
        # first so its value matches the pool path's q exactly.
        #
        # Two shapes of the same math (r5): the single full matmul
        # materializes scores [rows, g_h*T] — it grows quadratically with
        # the chunk and blew Mosaic's 16 MB scoped VMEM at T=256 (17.2 MB
        # measured), and 1 - 1/g_h of it is cross-head-masked waste. Wide
        # chunks therefore run a PER-HEAD x COLUMN-TILE loop with online
        # softmax updates on row slices of the scratch refs — score tiles
        # are [T*G, <=512], VMEM stays flat in T, and the masked-out
        # cross-head compute disappears entirely. The full-matrix shape is
        # kept for small/unaligned chunks (spec verify T = gamma+1 may not
        # be sublane-aligned; sub-8 MB scores don't need tiling).
        ct = 0
        if rows * g_h * T * 4 > _TILED_FRESH_MIN_BYTES and tg % 8 == 0:
            for c in (512, 256, 128, 64, 32, 16, 8):
                if T % c == 0:
                    ct = c
                    break

        if ct:
            for h in range(g_h):
                rs = slice(h * tg, (h + 1) * tg)
                q_h = (q_ref[0, 0, rs].astype(compute_dtype)
                       .astype(jnp.float32))                  # [tg, D]
                for j in range(T // ct):
                    def _col_tile(h=h, j=j, rs=rs, q_h=q_h):
                        cs = slice(h * T + j * ct, h * T + (j + 1) * ct)
                        k_h = kn_ref[0, 0, cs].astype(jnp.float32)
                        s = jax.lax.dot_general(
                            q_h, k_h, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
                        if softcap is not None:
                            s = softcap * jnp.tanh(s / softcap)
                        row_t = t0 + jax.lax.broadcasted_iota(
                            jnp.int32, s.shape, 0) // group
                        col_t = j * ct + jax.lax.broadcasted_iota(
                            jnp.int32, s.shape, 1)
                        ok = row_t >= col_t
                        if window is not None:
                            ok = ok & (row_t - col_t < window)
                        s = jnp.where(ok, s, NEG_INF)
                        m_prev = m_ref[rs]
                        m_new = jnp.maximum(
                            m_prev, jnp.max(s, axis=-1, keepdims=True))
                        p = jnp.exp(s - m_new)
                        alpha = jnp.exp(m_prev - m_new)
                        l_ref[rs] = (l_ref[rs] * alpha
                                     + jnp.sum(p, axis=-1, keepdims=True))
                        v_h = vn_ref[0, 0, cs].astype(jnp.float32)
                        acc_ref[rs] = (acc_ref[rs] * alpha
                                       + jax.lax.dot_general(
                                           p, v_h, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32))
                        m_ref[rs] = m_new
                    if tt_count > 1:
                        # col tiles wholly above this row tile's last token
                        # are fully causal-masked; skip their compute (the
                        # tile index tt is dynamic, so this is a pl.when,
                        # not an unrolling decision)
                        pl.when(j * ct < t0 + Tt)(_col_tile)
                    else:
                        _col_tile()
            m_new, l, acc = m_ref[:], l_ref[:], acc_ref[:]
        else:
            q = (q_ref[0, 0].astype(compute_dtype)
                 .astype(jnp.float32))                        # [rows, D]
            k = kn_ref[0, 0].astype(jnp.float32)              # [g_h*T, D]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale  # [rows, ghT]
            if softcap is not None:
                s = softcap * jnp.tanh(s / softcap)
            r_iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            c_iota = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            row_t = t0 + (r_iota % tg) // group
            col_t = c_iota % T
            ok = (c_iota // T == r_iota // tg) & (row_t >= col_t)
            if window is not None:
                ok = ok & (row_t - col_t < window)
            s = jnp.where(ok, s, NEG_INF)

            m_prev = m_ref[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            v = vn_ref[0, 0].astype(jnp.float32)   # f32 like k (see above)
            acc = acc_ref[:] * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if has_sinks:
            # GPT-OSS sink: one extra per-head logit with no value —
            # joins the global max and the denominator at finalize
            sk = sinks_ref[0]                              # [rows, 1] f32
            m_fin = jnp.maximum(m_new, sk)
            a2 = jnp.exp(m_new - m_fin)
            l = l * a2 + jnp.exp(sk - m_fin)
            acc = acc * a2
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kv_dtype", "sm_scale", "interpret",
                              "compute_dtype", "pages_per_step", "window",
                              "softcap")
)
def paged_chunk_attention_pallas(
    q: jax.Array,            # [B, T, Hq, D] fresh queries (rope applied)
    k_new: jax.Array,        # [B, T, Hkv, D] fresh keys (store-rounded)
    v_new: jax.Array,
    k_pool: jax.Array,       # [S, D/pack, Hkv*bs] (kT layout)
    v_pool: jax.Array,       # [S, Hkv, bs, D/pack]
    k_scale: jax.Array,      # [S, 1, Hkv*bs] f32 (flat, matches kT columns)
    v_scale: jax.Array,
    block_table: jax.Array,  # [B, max_blocks] int32 (clamped >= 0)
    start_pos: jax.Array,    # [B] int32 — pool tokens < start_pos are context
    kv_dtype: KVDtype,
    sm_scale: float | None = None,
    interpret: bool | None = None,
    scheme_id: jax.Array | None = None,   # MIXED8: 0=INT8 / 1=FP8 this call
    compute_dtype=jnp.float32,  # matmul operand dtype; bf16 = native MXU
    pages_per_step: int | None = None,
    window: int | None = None,  # static sliding window (Mistral family)
    softcap: float | None = None,  # static tanh score cap (Gemma family)
    sinks: jax.Array | None = None,  # [Hq] learned sink logits (GPT-OSS)
) -> jax.Array:
    """Drop-in kernel variant of `chunk_attention.paged_chunk_attention`.
    Returns [B, T, Hq, D]."""
    B, T, num_q_heads, head_dim = q.shape
    num_slots, num_kv_heads, block_size, _ = v_pool.shape
    max_blocks = block_table.shape[1]
    group = num_q_heads // num_kv_heads
    tg = T * group
    if tg < 8 and not (interpret if interpret is not None else interpret_mode()):
        # Mosaic miscompiles sub-sublane row tiles (TG < 8: verified
        # "vector.broadcast bf16 -> f32" verifier failure at TG=2). Pad the
        # token axis up to a full sublane tile; extra rows are discarded.
        pad_t = max(0, -(-8 // group) - T)   # smallest T' with T'*G >= 8
        qp = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        kp_ = jnp.pad(k_new, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        vp_ = jnp.pad(v_new, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        out = paged_chunk_attention_pallas(
            qp, kp_, vp_, k_pool, v_pool, k_scale, v_scale, block_table,
            start_pos, kv_dtype, sm_scale=sm_scale, interpret=interpret,
            scheme_id=scheme_id, compute_dtype=compute_dtype,
            pages_per_step=pages_per_step, window=window, softcap=softcap,
            sinks=sinks)
        return out[:, :T]
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    if interpret is None:
        interpret = interpret_mode()
    pack = 2 if kv_dtype == KVDtype.INT4 else 1
    mixed = kv_dtype == KVDtype.MIXED8
    ppb = max(1, pages_per_step or min(8, max_blocks))
    n_ctx_steps = -(-max_blocks // ppb)
    # heads per grid step: enough that a kT context tile spans >= 128 lanes
    # (the Mosaic lane rule); shrink to a divisor of Hkv
    g_h = min(num_kv_heads, max(1, -(-128 // block_size)))
    while num_kv_heads % g_h:
        g_h -= 1
    hg_count = num_kv_heads // g_h
    rows_full = g_h * tg

    # r5: query-row grid tiles for wide chunks. Per-grid-step VMEM (the
    # context loop's unrolled score temporaries + the fresh-part q/acc)
    # scales with the q rows — prefill_chunk=256 measured 18.7 MB against
    # Mosaic's 16 MB scoped limit on v5e. Cap rows per grid step at the
    # proven envelope and split the chunk's token range over an extra
    # grid axis; context blocks re-stream per row tile (HBM-side traffic
    # only — the host-side gathers the streamed path cares about are per
    # DISPATCH, unaffected), and fresh col tiles above a row tile's
    # causal range skip their compute in-kernel.
    n_tt = 1
    if rows_full > _ROWS_PER_GRID_TILE:
        for d in range(2, T + 1):
            if T % d or (T // d) * group % 8:
                continue
            if rows_full // d <= _ROWS_PER_GRID_TILE:
                n_tt = d
                break
    Tt = T // n_tt
    rows = g_h * Tt * group

    base = functools.partial(
        _chunk_kernel, kv_dtype=kv_dtype, block_size=block_size,
        head_dim=head_dim, group=group, g_h=g_h, chunk_t=T, ppb=ppb,
        sm_scale=float(sm_scale), compute_dtype=compute_dtype, window=window,
        softcap=softcap, has_sinks=sinks is not None, tt_count=n_tt)
    if mixed:
        def kernel(table_ref, start_ref, sid_ref, *rest):
            base(table_ref, start_ref, *rest, sid_ref=sid_ref)
    else:
        kernel = base

    if n_tt == 1:
        # [B, T, Hkv, G, D] -> [B, HG, g_h*T*G, D] (r = h_local*tg + t*G + g)
        q4 = (q.reshape(B, T, num_kv_heads, group, head_dim)
              .transpose(0, 2, 1, 3, 4).reshape(B, hg_count, rows, head_dim))
    else:
        # row order per (b, hg): (tt, h_local, t_local, g) — tile-major so
        # the (b, hg, tt) grid block is one contiguous rows-slice
        q4 = (q.reshape(B, n_tt, Tt, num_kv_heads, group, head_dim)
              .transpose(0, 3, 1, 2, 4, 5)
              .reshape(B, hg_count, g_h, n_tt, Tt, group, head_dim)
              .transpose(0, 1, 3, 2, 4, 5, 6)
              .reshape(B, hg_count, n_tt * rows, head_dim))
    kn = k_new.transpose(0, 2, 1, 3).reshape(
        B, hg_count, g_h * T, head_dim)   # [B, HG, g_h*T, D] head-major
    vn = v_new.transpose(0, 2, 1, 3).reshape(B, hg_count, g_h * T, head_dim)

    def ctx_index(j, mode):
        def f(b, hg, *a):
            if n_tt > 1:
                a = a[1:]   # drop the row-tile grid index
            i, t, s = a[0], a[1], a[2]
            # clamp to the lane's last real context block: trailing grid
            # steps re-address it, so their copies are elided
            last = jnp.maximum((s[b] - 1) // block_size, 0)
            idx = i * ppb + j
            if window is not None:
                # steps wholly below every query's window re-address the
                # first in-window block, eliding their copies
                first = jnp.maximum((s[b] - window) // block_size, 0)
                idx = jnp.maximum(idx, first)
            slot = t[b, jnp.minimum(idx, last)]
            if mode == "kt":
                # kT pool [S, D/pack, Hkv*bs]: this head-group's tile is
                # the hg-th (g_h*bs)-wide lane block
                return (slot, 0, hg)
            if mode == "v":
                return (slot, hg, 0, 0)
            return (slot, 0, hg)  # scales: this group's flat column block
        return f

    kt_spec = [pl.BlockSpec((1, head_dim // pack, g_h * block_size),
                            ctx_index(j, "kt")) for j in range(ppb)]
    v_spec = [pl.BlockSpec((1, g_h, block_size, head_dim // pack),
                           ctx_index(j, "v")) for j in range(ppb)]
    sc_spec = [pl.BlockSpec((1, 1, g_h * block_size),
                            ctx_index(j, "sc")) for j in range(ppb)]

    if n_tt == 1:
        qo_index = lambda b, hg, i, *_: (b, hg, 0, 0)
        kvn_index = lambda b, hg, i, *_: (b, hg, 0, 0)
        sink_index = lambda b, hg, i, *_: (hg, 0, 0)
        grid = (B, hg_count, n_ctx_steps + 1)
    else:
        qo_index = lambda b, hg, tt, i, *_: (b, hg, tt, 0)
        kvn_index = lambda b, hg, tt, i, *_: (b, hg, 0, 0)
        sink_index = lambda b, hg, tt, i, *_: (hg, tt, 0)
        grid = (B, hg_count, n_tt, n_ctx_steps + 1)
    sink_spec = ([pl.BlockSpec((1, rows, 1), sink_index)]
                 if sinks is not None else [])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if mixed else 2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, rows, head_dim), qo_index),
            pl.BlockSpec((1, 1, g_h * T, head_dim), kvn_index),
            pl.BlockSpec((1, 1, g_h * T, head_dim), kvn_index),
            *kt_spec, *v_spec, *sc_spec, *sc_spec, *sink_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, rows, head_dim), qo_index),
        scratch_shapes=[
            pltpu.VMEM((rows, head_dim), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
            pltpu.VMEM((rows, 1), jnp.float32),
        ],
    )

    scalars = (block_table, start_pos)
    if mixed:
        scalars += (jnp.reshape(scheme_id, (1,)).astype(jnp.int32),)
    operands = (q4, kn, vn) + (k_pool,) * ppb + (v_pool,) * ppb \
        + (k_scale,) * ppb + (v_scale,) * ppb
    if sinks is not None:
        # per-ROW sink values: row r carries sinks[h, g] (tile-major row
        # order when n_tt > 1 — same transform as q4)
        sk = jnp.broadcast_to(
            sinks.reshape(num_kv_heads, 1, group).astype(jnp.float32),
            (num_kv_heads, T, group))
        if n_tt == 1:
            sk = sk.reshape(hg_count, rows, 1)
        else:
            sk = (sk.reshape(hg_count, g_h, n_tt, Tt, group)
                  .transpose(0, 2, 1, 3, 4)
                  .reshape(hg_count, n_tt * rows, 1))
        operands += (sk,)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, hg_count, n_tt * rows, head_dim), q.dtype),
        interpret=interpret,
    )(*scalars, *operands)
    if n_tt == 1:
        # [B, HG, g_h*T*G, D] -> [B, T, Hq, D]
        return (out.reshape(B, num_kv_heads, T, group, head_dim)
                .transpose(0, 2, 1, 3, 4).reshape(B, T, num_q_heads, head_dim))
    return (out.reshape(B, hg_count, n_tt, g_h, Tt, group, head_dim)
            .transpose(0, 1, 3, 2, 4, 5, 6)
            .reshape(B, num_kv_heads, T, group, head_dim)
            .transpose(0, 2, 1, 3, 4).reshape(B, T, num_q_heads, head_dim))
