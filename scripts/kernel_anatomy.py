"""Decode-kernel per-call overhead anatomy (VERDICT r2 next-step #3).

kernel_probe.py showed the fixed component is per-CALL (~1.2ms at every
grid size from 16 to 512 steps), not per-grid-step. This script times
stripped kernel VARIANTS at one geometry to locate it:

  full     — the production kernel (ops/paged_attention.py)
  fetch    — same grid/BlockSpecs/scalar-prefetch, body only accumulates
             raw tiles (no dequant, no matmul): isolates the DMA pipeline
  dequant  — fetch + dequant + scale multiply (no attention math):
             adds the VPU cost of the dequant path
  matmul   — fetch + the two dot_generals on raw tiles (no dequant, no
             online softmax): adds the MXU cost

Run on TPU:  python scripts/kernel_anatomy.py [--scheme int8] [--bs 128]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scheme", default="int8")
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--ppb", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--minpool", type=int, default=512 * 1024 * 1024)
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from cxl_speckv_tpu.config import KVDtype
    from cxl_speckv_tpu.ops.paged_attention import (_dequant_tile,
                                                    paged_attention)
    from cxl_speckv_tpu.ops.pallas_utils import interpret_mode

    on_tpu = jax.default_backend() == "tpu"
    peak = 820.0 if on_tpu else None

    B, Hq, Hkv, D = 8, 32, 8, 128
    bs, ppb, ctx, N = args.bs, args.ppb, args.ctx, args.iters
    G = Hq // Hkv
    name = args.scheme
    kv_dtype = {"int8": KVDtype.INT8, "int4": KVDtype.INT4,
                "bf16": KVDtype.BF16}[name]
    pack = 2 if name == "int4" else 1
    elem = 2 if name == "bf16" else 1
    mb = ctx // bs
    n_steps = mb // ppb

    block_bytes = Hkv * bs * (D // pack) * elem
    S = max(B * mb + 1, args.minpool // block_bytes)
    kp = jnp.zeros((S, Hkv, bs, D // pack),
                   jnp.int8 if elem == 1 else jnp.bfloat16)
    # production kernel now takes the TRANSPOSED K pool (r3 layout)
    kpT_full = jnp.zeros((S, D // pack, Hkv * bs),
                         jnp.int8 if elem == 1 else jnp.bfloat16)
    vp = jnp.zeros_like(kp)
    ks = jnp.ones((S, Hkv, bs), jnp.float32)
    # production kernel's flat scale pools (variant kernels keep their own)
    ks_full = jnp.ones((S, 1, Hkv * bs), jnp.float32)
    vs_full = jnp.ones_like(ks_full)
    vs = jnp.ones_like(ks)
    table = jnp.asarray(np.arange(B * mb, dtype=np.int32).reshape(B, mb))
    lens = jnp.full(B, ctx, jnp.int32)
    q = jnp.zeros((B, Hq, D), jnp.bfloat16)

    def variant_kernel(mode):
        def kernel(table_ref, lens_ref, q_ref, *rest):
            k_refs = rest[0:ppb]
            v_refs = rest[ppb:2 * ppb]
            ks_refs = rest[2 * ppb:3 * ppb]
            vs_refs = rest[3 * ppb:4 * ppb]
            o_ref, acc_ref = rest[4 * ppb:]
            i = pl.program_id(1)

            @pl.when(i == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            hb = Hkv * bs
            if mode == "fetchrow":
                # touch ONE sublane per tile: the DMA still moves the whole
                # block, but the VPU processes ~1/bs of it — the closest
                # measurable thing to the pure DMA floor
                tot = jnp.zeros((1, 1), jnp.float32)
                for j in range(ppb):
                    tot += jnp.sum(
                        k_refs[j][0, :, :1, :].astype(jnp.float32)).reshape(1, 1)
                    tot += jnp.sum(
                        v_refs[j][0, :, :1, :].astype(jnp.float32)).reshape(1, 1)
                acc_ref[0:1, 0:1] += tot
            elif mode == "fetchint":
                # int32-accumulate reduce: no int8 -> float convert, so this
                # isolates DMA + integer reduce from the convert cost
                tot = jnp.zeros((1, 1), jnp.int32)
                for j in range(ppb):
                    tot += jnp.sum(k_refs[j][0].astype(jnp.int32)).reshape(1, 1)
                    tot += jnp.sum(v_refs[j][0].astype(jnp.int32)).reshape(1, 1)
                acc_ref[0:1, 0:1] += tot.astype(jnp.float32)
            elif mode == "fetch":
                # touch every byte of every tile; accumulate so nothing DCEs
                tot = jnp.zeros((1, 1), jnp.float32)
                for j in range(ppb):
                    tot += jnp.sum(k_refs[j][0].astype(jnp.float32)).reshape(1, 1)
                    tot += jnp.sum(v_refs[j][0].astype(jnp.float32)).reshape(1, 1)
                    tot += (jnp.sum(ks_refs[j][0])
                            + jnp.sum(vs_refs[j][0])).reshape(1, 1)
                acc_ref[0:1, 0:1] += tot
            elif mode == "dequant":
                def dq(raw_ref, sc_ref):
                    x = _dequant_tile(raw_ref[0], kv_dtype, D, None,
                                      out_dtype=jnp.bfloat16)
                    x = x * sc_ref[0][..., None].astype(jnp.bfloat16)
                    return x.reshape(hb, D)
                tot = jnp.zeros((1, 1), jnp.float32)
                for j in range(ppb):
                    tot += jnp.sum(
                        dq(k_refs[j], ks_refs[j]).astype(jnp.float32)).reshape(1, 1)
                    tot += jnp.sum(
                        dq(v_refs[j], vs_refs[j]).astype(jnp.float32)).reshape(1, 1)
                acc_ref[0:1, 0:1] += tot
            elif mode == "matmul":
                rows = Hkv * G
                qv = q_ref[0].reshape(rows, D).astype(jnp.bfloat16)
                for j in range(ppb):
                    k = k_refs[j][0].astype(jnp.bfloat16).reshape(hb, D // pack)
                    v = v_refs[j][0].astype(jnp.bfloat16).reshape(hb, D // pack)
                    s = jax.lax.dot_general(
                        qv[:, : D // pack], k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc_ref[:rows, : D // pack] += jax.lax.dot_general(
                        s.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            elif mode == "matmulT":
                # transposed-score form on the CURRENT pool layout: the QK
                # dot transposes q (8KB) instead of k (256KB), softmax runs
                # along sublanes, and PV contracts dim 0 of both operands —
                # if this matches v2's speed, no pool layout change is
                # needed, only kernel math
                rows = Hkv * G
                qv = q_ref[0].reshape(rows, D).astype(jnp.bfloat16)
                for j in range(ppb):
                    k = k_refs[j][0].astype(jnp.bfloat16).reshape(hb, D // pack)
                    v = v_refs[j][0].astype(jnp.bfloat16).reshape(hb, D // pack)
                    sT = jax.lax.dot_general(
                        k, qv[:, : D // pack], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)   # [hb, rows]
                    m = jnp.max(sT, axis=0, keepdims=True)
                    pT = jnp.exp(sT - m)
                    acc_ref[:rows, : D // pack] += jax.lax.dot_general(
                        pT.astype(jnp.bfloat16), v, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

            @pl.when(i == pl.num_programs(1) - 1)
            def _():
                o_ref[0] = acc_ref[: Hkv * G, :1].reshape(
                    Hkv, G, 1).astype(o_ref.dtype)

        return kernel

    def run_variant(mode):
        def kv_index(j, rank4=True):
            def f(b, i, t, l, *_):
                last = jnp.maximum((l[b] - 1) // bs, 0)
                slot = t[b, jnp.minimum(i * ppb + j, last)]
                return (slot, 0, 0, 0) if rank4 else (slot, 0, 0)
            return f

        kv_spec = [pl.BlockSpec((1, Hkv, bs, D // pack), kv_index(j))
                   for j in range(ppb)]
        sc_spec = [pl.BlockSpec((1, Hkv, bs), kv_index(j, rank4=False))
                   for j in range(ppb)]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_steps),
            in_specs=[pl.BlockSpec((1, Hkv, G, D), lambda b, i, *_: (b, 0, 0, 0)),
                      *kv_spec, *kv_spec, *sc_spec, *sc_spec],
            out_specs=pl.BlockSpec((1, Hkv, G, 1), lambda b, i, *_: (b, 0, 0, 0)),
            scratch_shapes=[pltpu.VMEM((max(Hkv * G, Hkv * bs), max(D, 128)),
                                       jnp.float32)],
        )
        q4 = q.reshape(B, Hkv, G, D)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(q4, kp, vp, ks, vs, table, lens, *, iters):
            def body(_, acc):
                out = pl.pallas_call(
                    variant_kernel(mode), grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((B, Hkv, G, 1), q4.dtype),
                    interpret=interpret_mode(),
                )(table, lens, q4 + acc[:, :, :, :1] * 0,
                  *((kp,) * ppb), *((vp,) * ppb),
                  *((ks,) * ppb), *((vs,) * ppb))
                return acc + out.astype(acc.dtype)
            return jax.lax.fori_loop(
                0, iters, body, jnp.zeros((B, Hkv, G, 1), jnp.float32))

        out = loop(q4, kp, vp, ks, vs, table, lens, iters=N)
        np.asarray(out)
        t0 = time.perf_counter()
        out = loop(q4, kp, vp, ks, vs, table, lens, iters=N)
        np.asarray(out)
        return (time.perf_counter() - t0) / N

    # -- v2 prototype: transposed-K pool [S, D, Hkv*bs] -------------------
    # Both matmuls MXU-native (QK^T: q [rows, D] @ kT [D, cols]; PV:
    # p [rows, cols] @ v [cols, D]) — no big-operand transposes. Scales
    # fold per-COLUMN post-matmul (a [1, cols] vector op) instead of
    # scaling whole K/V tiles pre-matmul. Online softmax updates per page.
    def run_v2(fused_scales=False, w8a8=False):
        rows = Hkv * G
        cols = Hkv * bs
        kpT = jnp.zeros((S, D // pack, cols),
                        jnp.int8 if elem == 1 else jnp.bfloat16)
        nsc = 1 if fused_scales else 2  # scale arrays per page
        scf = jnp.ones((S, 2, Hkv, bs), jnp.float32)

        def v2_kernel(table_ref, lens_ref, q_ref, *rest):
            kT_refs = rest[0:ppb]
            v_refs = rest[ppb:2 * ppb]
            if fused_scales:
                sc_refs = rest[2 * ppb:3 * ppb]
                o_ref, acc_ref, m_ref, l_ref = rest[3 * ppb:]
            else:
                ks_refs = rest[2 * ppb:3 * ppb]
                vs_refs = rest[3 * ppb:4 * ppb]
                o_ref, acc_ref, m_ref, l_ref = rest[4 * ppb:]
            b = pl.program_id(0)
            i = pl.program_id(1)
            seq_len = lens_ref[b]

            @pl.when(i == 0)
            def _():
                m_ref[:] = jnp.full_like(m_ref, -1e30)
                l_ref[:] = jnp.zeros_like(l_ref)
                acc_ref[:] = jnp.zeros_like(acc_ref)

            @pl.when(i * ppb * bs < seq_len)
            def _():
                q = q_ref[0].reshape(rows, D).astype(jnp.bfloat16)
                c_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
                r_head = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, cols), 0) // G
                c_head = c_idx // bs
                head_ok = c_head == r_head
                q8 = (jnp.clip(q_ref[0].reshape(rows, D) * 127.0, -127, 127)
                      .astype(jnp.int8) if w8a8 else None)
                for j in range(ppb):
                    kT = kT_refs[j][0]                      # [D/pack, cols]
                    if name == "int4":
                        r = kT.astype(jnp.int32)
                        lo = (r << 28) >> 28
                        hi = (r << 24) >> 28
                        kT = jnp.concatenate([lo, hi], axis=0)
                    if w8a8:
                        # int8 x int8 MXU: no K convert on the QK path; the
                        # int32 scores fold q/k scales in f32 afterwards
                        s = jax.lax.dot_general(
                            q8, kT, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32
                        ).astype(jnp.float32) * (1.0 / 127.0)
                    else:
                        s = jax.lax.dot_general(
                            q, kT.astype(jnp.bfloat16),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [rows, cols]
                    ksf = (sc_refs[j][0, 0] if fused_scales
                           else ks_refs[j][0]).reshape(1, cols)
                    s = s * ksf * (D ** -0.5)
                    pos = (i * ppb + j) * bs + c_idx % bs
                    s = jnp.where(head_ok & (pos < seq_len), s, -1e30)
                    m_prev = m_ref[:]
                    m_new = jnp.maximum(
                        m_prev, jnp.max(s, axis=-1, keepdims=True))
                    p = jnp.exp(s - m_new)
                    alpha = jnp.exp(m_prev - m_new)
                    vsf = (sc_refs[j][0, 1] if fused_scales
                           else vs_refs[j][0]).reshape(1, cols)
                    l_ref[:] = l_ref[:] * alpha + jnp.sum(
                        p, axis=-1, keepdims=True)
                    vr = v_refs[j][0]                    # [Hkv, bs, D/pack]
                    if name == "int4":
                        r = vr.astype(jnp.int32)
                        vr = jnp.concatenate(
                            [(r << 28) >> 28, (r << 24) >> 28], axis=-1)
                    v = vr.astype(jnp.bfloat16).reshape(cols, D)
                    acc_ref[:] = (
                        acc_ref[:] * alpha
                        + jax.lax.dot_general(
                            (p * vsf).astype(jnp.bfloat16), v,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))
                    m_ref[:] = m_new

            @pl.when(i == pl.num_programs(1) - 1)
            def _():
                o_ref[0] = (acc_ref[:, :1] / jnp.maximum(l_ref[:], 1e-30)
                            ).reshape(Hkv, G, 1).astype(o_ref.dtype)

        def kT_index(j):
            def f(b, i, t, l, *_):
                last = jnp.maximum((l[b] - 1) // bs, 0)
                return (t[b, jnp.minimum(i * ppb + j, last)], 0, 0)
            return f

        def kv_index(j, rank4=True):
            def f(b, i, t, l, *_):
                last = jnp.maximum((l[b] - 1) // bs, 0)
                slot = t[b, jnp.minimum(i * ppb + j, last)]
                return (slot, 0, 0, 0) if rank4 else (slot, 0, 0)
            return f

        if fused_scales:
            sc_specs = [pl.BlockSpec((1, 2, Hkv, bs), kv_index(j))
                        for j in range(ppb)]
        else:
            sc_specs = ([pl.BlockSpec((1, Hkv, bs), kv_index(j, False))
                         for j in range(ppb)] * 2)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_steps),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D), lambda b, i, *_: (b, 0, 0, 0)),
                *[pl.BlockSpec((1, D // pack, cols), kT_index(j))
                  for j in range(ppb)],
                *[pl.BlockSpec((1, Hkv, bs, D // pack), kv_index(j))
                  for j in range(ppb)],
                *sc_specs,
            ],
            out_specs=pl.BlockSpec((1, Hkv, G, 1),
                                   lambda b, i, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((rows, D), jnp.float32),
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, 1), jnp.float32),
            ],
        )
        q4 = q.reshape(B, Hkv, G, D)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(q4, kpT, vp, ks, vs, scf, table, lens, *, iters):
            sc_ops = ((scf,) * ppb if fused_scales
                      else (ks,) * ppb + (vs,) * ppb)
            def body(_, acc):
                out = pl.pallas_call(
                    v2_kernel, grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((B, Hkv, G, 1), q4.dtype),
                    interpret=interpret_mode(),
                )(table, lens, q4 + acc[:, :, :, :1] * 0,
                  *((kpT,) * ppb), *((vp,) * ppb), *sc_ops)
                return acc + out.astype(acc.dtype)
            return jax.lax.fori_loop(
                0, iters, body, jnp.zeros((B, Hkv, G, 1), jnp.float32))

        out = loop(q4, kpT, vp, ks, vs, scf, table, lens, iters=N)
        np.asarray(out)
        t0 = time.perf_counter()
        out = loop(q4, kpT, vp, ks, vs, scf, table, lens, iters=N)
        np.asarray(out)
        return (time.perf_counter() - t0) / N

    # -- v5 prototype: manual DMA ring, grid (B,) --------------------------
    # Mosaic's automatic BlockSpec pipelining runs at depth 2: every grid
    # step WAITS on ~4*ppb block DMAs issued one step ahead, so per-step
    # latency is a DMA latency chain (~1.2ms/call at every geometry — the
    # measured floor). Here the kernel issues its own DMAs NBUF blocks
    # ahead into a VMEM ring, so ~4*NBUF transfers stay in flight and the
    # wait is amortized across the whole sequence.
    def run_v5(nbuf=8, compute="row"):
        def v5_kernel(table_ref, lens_ref, q_ref, kp_ref, vp_ref,
                      ks_ref, vs_ref, o_ref):
            b = pl.program_id(0)
            seq_len = lens_ref[b]
            nblk = (seq_len + bs - 1) // bs

            def body(kbuf, vbuf, ksb, vsb, acc, sems):
                def copies(i, buf):
                    s = table_ref[b, i]
                    return (
                        pltpu.make_async_copy(kp_ref.at[s], kbuf.at[buf],
                                              sems.at[buf, 0]),
                        pltpu.make_async_copy(vp_ref.at[s], vbuf.at[buf],
                                              sems.at[buf, 1]),
                        pltpu.make_async_copy(ks_ref.at[s], ksb.at[buf],
                                              sems.at[buf, 2]),
                        pltpu.make_async_copy(vs_ref.at[s], vsb.at[buf],
                                              sems.at[buf, 3]),
                    )

                for w in range(nbuf):
                    @pl.when(w < nblk)
                    def _(w=w):
                        for c in copies(w, w):
                            c.start()

                acc[:] = jnp.zeros_like(acc)

                def step(i, carry):
                    buf = jax.lax.rem(i, nbuf)
                    for c in copies(i, buf):   # matching descriptor to wait
                        c.wait()
                    if compute == "row":
                        t = jnp.sum(kbuf[buf, :, :1, :].astype(jnp.float32))
                        t += jnp.sum(vbuf[buf, :, :1, :].astype(jnp.float32))
                        acc[0:1, 0:1] += t.reshape(1, 1)
                    @pl.when(i + nbuf < nblk)
                    def _():
                        for c in copies(i + nbuf, buf):
                            c.start()
                    return carry

                jax.lax.fori_loop(0, nblk, step, 0)
                o_ref[0] = acc[: Hkv * G, :1].reshape(Hkv, G, 1).astype(
                    o_ref.dtype)

            pl.run_scoped(
                body,
                kbuf=pltpu.VMEM((nbuf, Hkv, bs, D // pack),
                                jnp.int8 if elem == 1 else jnp.bfloat16),
                vbuf=pltpu.VMEM((nbuf, Hkv, bs, D // pack),
                                jnp.int8 if elem == 1 else jnp.bfloat16),
                ksb=pltpu.VMEM((nbuf, Hkv, bs), jnp.float32),
                vsb=pltpu.VMEM((nbuf, Hkv, bs), jnp.float32),
                acc=pltpu.VMEM((max(Hkv * G, 8), 128), jnp.float32),
                sems=pltpu.SemaphoreType.DMA((nbuf, 4)),
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, Hkv, G, D), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, Hkv, G, 1), lambda b, *_: (b, 0, 0, 0)),
        )
        q4 = q.reshape(B, Hkv, G, D)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(q4, kp, vp, ks, vs, table, lens, *, iters):
            def body(_, acc):
                out = pl.pallas_call(
                    v5_kernel, grid_spec=grid_spec,
                    out_shape=jax.ShapeDtypeStruct((B, Hkv, G, 1), q4.dtype),
                    interpret=interpret_mode(),
                )(table, lens, q4 + acc[:, :, :, :1] * 0, kp, vp, ks, vs)
                return acc + out.astype(acc.dtype)
            return jax.lax.fori_loop(
                0, iters, body, jnp.zeros((B, Hkv, G, 1), jnp.float32))

        out = loop(q4, kp, vp, ks, vs, table, lens, iters=N)
        np.asarray(out)
        t0 = time.perf_counter()
        out = loop(q4, kp, vp, ks, vs, table, lens, iters=N)
        np.asarray(out)
        return (time.perf_counter() - t0) / N

    @functools.partial(jax.jit, static_argnames=("iters",))
    def full_loop(q, kp, vp, ks, vs, table, lens, *, iters):
        def body(_, q):
            return paged_attention(q, kp, vp, ks, vs, table, lens, kv_dtype,
                                   compute_dtype=jnp.bfloat16,
                                   pages_per_step=ppb).astype(q.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    kv_bytes = B * ctx * Hkv * (D // pack) * elem * 2
    sc_bytes = B * ctx * Hkv * 4 * 2
    tot_bytes = kv_bytes + sc_bytes
    print(f"scheme={name} bs={bs} ppb={ppb} ctx={ctx} steps={B*n_steps} "
          f"bytes/call={tot_bytes/1e6:.0f}MB "
          f"ideal={tot_bytes/820e9*1e6:.0f}us", flush=True)

    out = full_loop(q, kpT_full, vp, ks_full, vs_full, table, lens, iters=N)
    np.asarray(out)
    t0 = time.perf_counter()
    out = full_loop(q, kpT_full, vp, ks_full, vs_full, table, lens, iters=N)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / N
    print(f"full    : {dt*1e6:8.0f} us/call {tot_bytes/dt/1e9:7.1f} GB/s",
          flush=True)

    for mode in ("fetch", "matmul", "matmulT"):
        try:
            dt = run_variant(mode)
            print(f"{mode:8s}: {dt*1e6:8.0f} us/call "
                  f"{tot_bytes/dt/1e9:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"{mode:8s}: FAIL {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
    for fused, w8, label in ((False, False, "v2"),
                             (True, False, "v3fused")):
        try:
            dt = run_v2(fused, w8)
            print(f"{label:8s}: {dt*1e6:8.0f} us/call "
                  f"{tot_bytes/dt/1e9:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"{label:8s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    for nbuf in (4, 8, 16):
        try:
            dt = run_v5(nbuf=nbuf)
            print(f"v5ring{nbuf:<2d}: {dt*1e6:8.0f} us/call "
                  f"{tot_bytes/dt/1e9:7.1f} GB/s", flush=True)
        except Exception as e:
            print(f"v5ring{nbuf:<2d}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
