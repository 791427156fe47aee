"""Decode-kernel bandwidth decomposition sweep (VERDICT r2 next-step #3).

Hypothesis from the round-2 numbers (int8 96 GB/s = 12% of peak with a ~1ms
fixed component): the cost is per-GRID-STEP, not per-call. At the bench
geometry (B=8, ctx=8k, bs=32, ppb=8) the grid runs 256 sequential steps of
~524KB each — 0.64us of data time per step against multiple us of step
sequencing + 34 BlockSpec DMA issues. The levers are therefore fewer,
fatter steps: pages_per_step (ppb) and block_size (bs).

Sweep: kv_dtype x block_size x ppb at fixed B/ctx, timed with the
N-iteration in-program loop (one dispatch + one value fetch per
measurement; block_until_ready lies over the axon tunnel).

Run on TPU:  python scripts/kernel_probe.py [--ctx 8192] [--iters 30]
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
    ap.add_argument("--ctx", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--schemes", default="int8,int4,bf16")
    ap.add_argument("--bs", default="32,128")
    ap.add_argument("--ppb", default="4,8,16")
    ap.add_argument("--minpool", type=int, default=512 * 1024 * 1024,
                    help="pool floor in bytes (>> VMEM so streams hit HBM)")
    args = ap.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize pins the axon platform; honor an explicit CPU ask
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp
    import numpy as np

    from cxl_speckv_tpu.config import KVDtype
    from cxl_speckv_tpu.ops.paged_attention import paged_attention

    on_tpu = jax.default_backend() == "tpu"
    peak = 820.0 if on_tpu else None  # v5e HBM GB/s

    @functools.partial(jax.jit, static_argnames=("kv_dtype", "iters", "ppb"))
    def loop(q, kp, vp, ks, vs, table, lens, *, kv_dtype, iters, ppb):
        def body(_, q):
            return paged_attention(q, kp, vp, ks, vs, table, lens, kv_dtype,
                                   compute_dtype=jnp.bfloat16,
                                   pages_per_step=ppb).astype(q.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    B, Hq, Hkv, D = args.batch, 32, 8, 128
    ctx, N = args.ctx, args.iters
    schemes = {"int8": KVDtype.INT8, "int4": KVDtype.INT4,
               "bf16": KVDtype.BF16}
    print(f"B={B} ctx={ctx} iters={N}", flush=True)
    for name in args.schemes.split(","):
        kv_dtype = schemes[name]
        pack = 2 if name == "int4" else 1
        elem = 2 if name == "bf16" else 1
        for bs in (int(x) for x in args.bs.split(",")):
            mb = ctx // bs
            block_bytes = Hkv * bs * (D // pack) * elem
            S = max(B * mb + 1, args.minpool // block_bytes)
            kp = jnp.zeros((S, D // pack, Hkv * bs),
                           jnp.int8 if elem == 1 else jnp.bfloat16)
            vp = jnp.zeros((S, Hkv, bs, D // pack),
                           jnp.int8 if elem == 1 else jnp.bfloat16)
            ks = jnp.ones((S, 1, Hkv * bs), jnp.float32)
            vs = jnp.ones_like(ks)
            table = jnp.asarray(
                np.arange(B * mb, dtype=np.int32).reshape(B, mb))
            lens = jnp.full(B, ctx, jnp.int32)
            q = jnp.zeros((B, Hq, D), jnp.bfloat16)
            for ppb in (int(x) for x in args.ppb.split(",")):
                if ppb > mb:
                    continue
                try:
                    out = loop(q, kp, vp, ks, vs, table, lens,
                               kv_dtype=kv_dtype, iters=N, ppb=ppb)
                    np.asarray(out)  # warm + sync
                    t0 = time.perf_counter()
                    out = loop(q, kp, vp, ks, vs, table, lens,
                               kv_dtype=kv_dtype, iters=N, ppb=ppb)
                    np.asarray(out)
                    dt = (time.perf_counter() - t0) / N
                except Exception as e:  # VMEM overflow etc: report, continue
                    print(f"{name:5s} bs={bs:4d} ppb={ppb:3d}: FAIL "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                    continue
                kv_bytes = B * ctx * Hkv * (D // pack) * elem * 2
                sc_bytes = B * ctx * Hkv * 4 * 2
                gbs = (kv_bytes + sc_bytes) / dt / 1e9
                steps = B * (mb // ppb)
                util = f" {100*gbs/peak:5.1f}%" if peak else ""
                print(f"{name:5s} bs={bs:4d} ppb={ppb:3d} steps={steps:5d}: "
                      f"{dt*1e6:8.0f} us/call {gbs:7.1f} GB/s{util}",
                      flush=True)


if __name__ == "__main__":
    main()
