"""Decode ROUND anatomy: decompose the fused decode program's wall clock.

The r4 paired-arm decomposition (NOTES_ROUND4) showed the serving round is
t = floor + weight_bytes/rate with rate ~574 GB/s and a floor that is ~60%
of round time and scales with lanes. This probe names the floor's parts by
sweeping the REAL production program (`decode_multi_packed`, the same
function the engine dispatches, Pallas kernels on) along axes that isolate
one cost each — at the bench geometry (Llama-3.2-1B, B=8 lanes, bs=32,
INT8 KV):

  horizon 1 vs 4 vs 16   -> per-DISPATCH overhead vs per-STEP cost
                            (same program family, 3 compiles)
  weights bf16 vs int8   -> the weight-stream term (byte delta / time
                            delta = in-program stream rate)
  context 2 vs 8 blocks  -> the KV/attention-bytes term (same compiled
                            program — lens are data, not shape)

What remains after subtracting weight stream and KV bytes from the int8
per-step cost is the compute floor: projections/RoPE/norms on tiny
[8, 2048] activations, the attention kernel grid's per-call work, in-graph
sampling (argmax over [8, 128256] logits), and lax.scan sequencing.

Run on TPU:  python scripts/round_anatomy.py [--reps 5]
CPU smoke:   JAX_PLATFORMS=cpu python scripts/round_anatomy.py --smoke
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config CPU smoke (mechanics only)")
    ap.add_argument("--slots", type=int, default=0,
                    help="override pool slot count (isolates the pool-size "
                         "effect: a pool that fits VMEM decodes faster)")
    ap.add_argument("--horizons", default="",
                    help="comma-separated horizon override, e.g. 16,32,64")
    ap.add_argument("--arms", default="bf16,int8",
                    help="weight arms to run (comma-separated)")
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from cxl_speckv_tpu.config import KVDtype
    from cxl_speckv_tpu.models.configs import llama_3_2_1b, tiny_test_config
    from cxl_speckv_tpu.models.llama import decode_multi_packed, init_params
    from cxl_speckv_tpu.ops.quant import kv_storage_dtype
    from cxl_speckv_tpu.ops.wquant import QuantizedTensor, quantize_weights

    on_tpu = jax.default_backend() == "tpu"
    if args.smoke:
        os.environ.setdefault("SPECKV_INTERPRET", "1")

    config = tiny_test_config() if args.smoke else llama_3_2_1b()
    use_pallas = on_tpu
    kv_dtype = KVDtype.INT8
    B, bs = (2, 8) if args.smoke else (8, 32)
    max_blocks = 16
    num_slots = args.slots or B * max_blocks + 1
    assert num_slots > B * max_blocks, "slots must cover B*max_blocks + guard"
    horizons = (1, 2) if args.smoke else (1, 4, 16)
    if args.horizons:
        horizons = tuple(int(h) for h in args.horizons.split(","))
    ctxs = (1, 2) if args.smoke else (2, 8)  # context blocks per lane

    params = init_params(config, jax.random.PRNGKey(0))
    jax.block_until_ready(jax.tree.leaves(params))

    kt_shape = (config.num_layers, num_slots, config.head_dim,
                config.num_kv_heads * bs)
    kv_shape = (config.num_layers, num_slots, config.num_kv_heads, bs,
                config.head_dim)
    sc_shape = (config.num_layers, num_slots, 1, config.num_kv_heads * bs)
    elem = kv_storage_dtype(kv_dtype)

    def fresh_pools():
        return (jnp.zeros(kt_shape, elem), jnp.zeros(kv_shape, elem),
                jnp.ones(sc_shape, jnp.float32),
                jnp.ones(sc_shape, jnp.float32))

    def packed_for(ctx_blocks: int, horizon: int):
        # same packed layout the engine builds (engine.py decode tick)
        mb = max_blocks
        start = ctx_blocks * bs - 2  # horizon tokens must fit the last block
        packed = np.zeros((B, 4 + mb), np.int32)
        packed[:, 0] = 7          # first token
        packed[:, 1] = start      # position
        packed[:, 2] = 0          # greedy
        packed[:, 3] = 1          # rng counter
        packed[:, 4:] = num_slots - 1  # guard
        for b in range(B):
            packed[b, 4:4 + max_blocks] = np.arange(
                b * max_blocks, (b + 1) * max_blocks)
        return jnp.asarray(packed)

    def weight_gb(p):
        leaves = jax.tree.leaves(
            p, is_leaf=lambda x: isinstance(x, QuantizedTensor))
        tot = 0.0
        for x in leaves:
            if isinstance(x, QuantizedTensor):
                tot += x.q.size * x.q.dtype.itemsize + x.s.size * 4
            else:
                tot += x.size * x.dtype.itemsize
        return tot / 1e9

    def kv_gb_per_step(ctx_blocks):
        return (B * ctx_blocks * bs * config.num_layers * 2
                * config.num_kv_heads * config.head_dim) / 1e9  # int8 = 1B

    arms = {"bf16": params, "int8": jax.jit(quantize_weights)(params)}
    arms = {k: v for k, v in arms.items() if k in args.arms.split(",")}
    jax.block_until_ready(jax.tree.leaves(arms))

    def run(p, horizon, ctx_blocks, reps):
        pk = packed_for(ctx_blocks, horizon)
        pools = fresh_pools()  # the program donates pools; rethread returns
        ts = []
        for _ in range(reps + 1):
            t0 = time.monotonic()
            toks, *rest = decode_multi_packed(
                p, config, kv_dtype, pk, *pools,
                horizon=horizon, use_pallas=use_pallas)
            np.asarray(toks)  # value fetch = real sync on remote runtimes
            ts.append(time.monotonic() - t0)
            pools = tuple(rest[:4])
        return float(np.median(ts[1:]))  # drop the first (compile/warm)

    print(f"# B={B} lanes, {config.num_layers} layers, bs={bs}, INT8 KV, "
          f"pallas={use_pallas}; times are median of {args.reps} "
          f"(first run dropped)", flush=True)
    results = {}
    for wq, p in arms.items():
        for h in horizons:
            for cb in ctxs:
                t = run(p, h, cb, args.reps)
                results[(wq, h, cb)] = t
                print(f"{wq:5s} horizon={h:3d} ctx={cb * bs:4d}tok  "
                      f"{t * 1e3:8.1f} ms", flush=True)

    # ---- decomposition ---------------------------------------------------
    if len(horizons) < 2 or set(arms) != {"bf16", "int8"}:
        return  # single-axis probe (e.g. --slots pool-size experiment)
    hi, lo = max(horizons), min(horizons)
    cb_hi, cb_lo = max(ctxs), min(ctxs)
    slope = {}
    for wq in arms:
        # per-step cost from the horizon slope at the small context
        slope[wq] = (results[(wq, hi, cb_lo)] - results[(wq, lo, cb_lo)]) / (
            hi - lo)
    dispatch = {wq: results[(wq, lo, cb_lo)] - lo * slope[wq] for wq in arms}
    wdelta_gb = weight_gb(arms["bf16"]) - weight_gb(arms["int8"])
    wstep = slope["bf16"] - slope["int8"]  # s per step of extra weight bytes
    rate = wdelta_gb / wstep if wstep > 0 else float("nan")
    # KV term from the context slope (same program, data-only change)
    kvstep = (results[("int8", hi, cb_hi)] - results[("int8", hi, cb_lo)]) / (
        hi - lo)
    kv_gb = kv_gb_per_step(cb_hi) - kv_gb_per_step(cb_lo)
    kv_rate = kv_gb / kvstep if kvstep > 0 else float("nan")
    w_int8_s = weight_gb(arms["int8"]) / rate if rate == rate else float("nan")
    resid = slope["int8"] - w_int8_s - kvstep * 0  # at cb_lo the kv term is
    # part of the measured slope; report it separately at cb_lo's size
    kv_lo_s = kv_gb_per_step(cb_lo) / kv_rate if kv_rate == kv_rate else 0.0
    resid = slope["int8"] - w_int8_s - kv_lo_s

    print("\n# decomposition (per decode STEP, int8-weight arm, "
          f"ctx={cb_lo * bs} tok):")
    print(f"#   dispatch overhead  {dispatch['int8'] * 1e3:7.2f} ms/dispatch "
          f"(bf16 arm {dispatch['bf16'] * 1e3:.2f})")
    print(f"#   weight stream      {w_int8_s * 1e3:7.2f} ms/step  "
          f"({weight_gb(arms['int8']):.2f} GB at {rate:.0f} GB/s — from the "
          f"bf16/int8 slope delta)")
    print(f"#   kv stream          {kv_lo_s * 1e3:7.2f} ms/step  "
          f"({kv_gb_per_step(cb_lo) * 1e3:.1f} MB at {kv_rate:.0f} GB/s — "
          f"from the context slope)")
    print(f"#   compute/seq floor  {resid * 1e3:7.2f} ms/step  "
          f"(projections+RoPE+norms on [B={B}, {config.hidden_size}], "
          f"attention grid work, argmax over [{B}, {config.vocab_size}], "
          f"scan sequencing)")
    print(f"#   per-step total     {slope['int8'] * 1e3:7.2f} ms/step; "
          f"16-step round = {dispatch['int8'] * 1e3 + 16 * slope['int8'] * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
