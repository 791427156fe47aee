"""Host-computation cost model probe (r4, streamed-path overlap work).

The streamed path's dispatches are dominated by `compute_on("device_host")`
gather + `device_put` hops (~18-29 ms each measured in r3). To pick the
right consolidation (fewer ops vs smaller ops), measure on the real TPU:

  A. 16 sequential "layer gathers" of 4 arrays each (today's shape:
     one compute_on block per layer, 4 host gathers + 4 device_puts)
  B. 16 sequential gathers of ONE array each (is the cost per block or
     per array?)
  C. 1 gather of 16x the rows, 4 arrays (all layers at once: same bytes
     as A in 1/16th the ops)
  D. A but with the gathers dataflow-INDEPENDENT of the consuming chain
     (can the scheduler overlap host ops with device compute at all?)

Run on TPU:  python scripts/hostop_probe.py
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
    from jax.experimental import compute_on
    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    if not on_tpu:
        print("needs TPU")
        return
    host = SingleDeviceSharding(dev, memory_kind="pinned_host")
    devs = SingleDeviceSharding(dev)

    L, W, Hkv, bs, D = 16, 128, 8, 8, 64   # llama-3.2-1b streamed shapes
    rows_total = 4096
    k = jax.device_put(np.zeros((rows_total, Hkv, bs, D), np.int8), host)
    v = jax.device_put(np.zeros((rows_total, Hkv, bs, D), np.int8), host)
    ks = jax.device_put(np.zeros((rows_total, Hkv, bs), np.float32), host)
    vs = jax.device_put(np.zeros((rows_total, Hkv, bs), np.float32), host)
    idx_host = jax.device_put(np.arange(W, dtype=np.int32), host)
    idx16_host = jax.device_put(np.arange(16 * W, dtype=np.int32), host)

    def gather4(rows):
        with compute_on.compute_on("device_host"):
            a, b, c, d = k[rows], v[rows], ks[rows], vs[rows]
        return (jax.device_put(a, devs), jax.device_put(b, devs),
                jax.device_put(c, devs), jax.device_put(d, devs))

    def gather1(rows):
        with compute_on.compute_on("device_host"):
            a = k[rows]
        return jax.device_put(a, devs)

    @jax.jit
    def prog_a(x):
        # 16 "layers": gather depends on carry (serial chain, today's shape)
        def body(i, x):
            a, b, c, d = gather4(idx_host + (x[0] % 16).astype(jnp.int32) * 0)
            return x + (a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()
                        + c.sum() + d.sum())
        return jax.lax.fori_loop(0, 16, body, x)

    @jax.jit
    def prog_b(x):
        def body(i, x):
            a = gather1(idx_host)
            return x + a.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, 16, body, x)

    @jax.jit
    def prog_c(x):
        a, b, c, d = gather4(idx16_host)
        return x + (a.astype(jnp.float32).sum() + b.astype(jnp.float32).sum()
                    + c.sum() + d.sum())

    @jax.jit
    def prog_d(x):
        # 16 INDEPENDENT gathers (unrolled, no loop-carried dependence on x)
        # plus a device compute chain — if the runtime can overlap host ops
        # with device work, this beats prog_a
        outs = []
        for i in range(16):
            outs.append(gather1(idx_host))
        y = x
        for i in range(200):
            y = jnp.tanh(y @ jnp.ones((256, 256), jnp.float32) * 1e-3)
        return y.sum() + sum(o.astype(jnp.float32).sum() for o in outs)

    x0 = jnp.zeros((1,), jnp.float32)
    xm = jnp.zeros((256, 256), jnp.float32)
    for name, fn, arg in (("A 16x(4-array gather)", prog_a, x0),
                          ("B 16x(1-array gather)", prog_b, x0),
                          ("C 1x(4-array gather, 16x rows)", prog_c, x0),
                          ("D 16 indep 1-array gathers + compute", prog_d, xm)):
        out = fn(arg)           # compile + first run
        np.asarray(out)
        ts = []
        for _ in range(5):
            t0 = time.monotonic()
            np.asarray(fn(arg))
            ts.append(time.monotonic() - t0)
        print(f"{name}: median {sorted(ts)[2]*1e3:.1f} ms "
              f"({['%.0f' % (t*1e3) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
