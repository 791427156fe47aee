"""Paged-attention kernel micro-benchmark: HBM bandwidth utilization.

The "fused dequant attention at HBM speed-of-light" deliverable
(BASELINE.md north star): decode attention is bandwidth-bound — the kernel's
quality metric is achieved GB/s of KV traffic vs the chip's HBM peak
(v5e ~820 GB/s). Run on TPU: python scripts/kernel_bench.py

Measurement recipe for remote-dispatch runtimes (axon tunnel): N dependent
kernel invocations run inside ONE jit program (lax.fori_loop), so per-call
time is device-bound — a single dispatch + one value fetch bracket the
whole loop. Pools are sized >> VMEM so the stream really comes from HBM.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cxl_speckv_tpu.config import KVDtype
    from cxl_speckv_tpu.ops.paged_attention import paged_attention

    on_tpu = jax.default_backend() == "tpu"
    peak_gbs = 820.0 if on_tpu else None  # v5e HBM

    @functools.partial(jax.jit,
                       static_argnames=("kv_dtype", "iters", "cdt"))
    def attention_loop(q, kp, vp, ks, vs, table, lens, *, kv_dtype, iters,
                       cdt):
        def body(_, q):
            return paged_attention(q, kp, vp, ks, vs, table, lens,
                                   kv_dtype,
                                   compute_dtype=cdt).astype(q.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    # Llama-3-8B decode geometry, long context
    B, Hq, Hkv, D, bs = 8, 32, 8, 128, 32
    N = 50
    cdt = jnp.bfloat16 if "--f32" not in sys.argv else jnp.float32
    print(f"compute_dtype={jnp.dtype(cdt).name}", flush=True)
    for kv_dtype, name in ((KVDtype.INT8, "int8"), (KVDtype.INT4, "int4"),
                           (KVDtype.BF16, "bf16")):
        pack = 2 if kv_dtype == KVDtype.INT4 else 1
        elem = {"int8": 1, "int4": 1, "bf16": 2}[name]
        for ctx in (2048, 8192):
            mb = ctx // bs
            # pool must dwarf VMEM or XLA parks it on-chip and the "HBM"
            # stream never leaves VMEM (bandwidth reads >100% of peak)
            block_bytes = Hkv * bs * (D // pack) * elem
            S = max(B * mb + 1, (512 * 1024 * 1024) // block_bytes)
            kp = jnp.zeros((S, D // pack, Hkv * bs),
                           jnp.int8 if name != "bf16" else jnp.bfloat16)
            vp = jnp.zeros((S, Hkv, bs, D // pack),
                           jnp.int8 if name != "bf16" else jnp.bfloat16)
            ks = jnp.ones((S, 1, Hkv * bs), jnp.float32)
            vs = jnp.ones_like(ks)
            table = jnp.asarray(
                np.arange(B * mb, dtype=np.int32).reshape(B, mb))
            lens = jnp.full(B, ctx, jnp.int32)
            q = jnp.zeros((B, Hq, D), jnp.bfloat16)

            out = attention_loop(q, kp, vp, ks, vs, table, lens,
                                 kv_dtype=kv_dtype, iters=N, cdt=cdt)
            np.asarray(out)  # warm: compile + one run, value-fetch sync
            t0 = time.perf_counter()
            out = attention_loop(q, kp, vp, ks, vs, table, lens,
                                 kv_dtype=kv_dtype, iters=N, cdt=cdt)
            np.asarray(out)  # value fetch: block_until_ready lies over tunnels
            dt = (time.perf_counter() - t0) / N
            # bytes of KV actually streamed per kernel invocation
            kv_bytes = B * ctx * Hkv * (D // pack) * elem * 2  # K and V
            sc_bytes = B * ctx * Hkv * 4 * 2
            gbs = (kv_bytes + sc_bytes) / dt / 1e9
            util = f" ({100*gbs/peak_gbs:.0f}% of HBM peak)" if peak_gbs else ""
            print(f"{name:5s} ctx={ctx:5d}: {dt*1e6:7.0f} us/call, "
                  f"{gbs:6.1f} GB/s{util}", flush=True)


if __name__ == "__main__":
    main()
