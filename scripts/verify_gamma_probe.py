"""Isolate the verify+accept program's cost vs gamma (spec-round anatomy).

spec_bench measured the 8B ngram round at 62.6 ms (gamma=4) but 204 ms
(gamma=8) — far beyond the extra verify compute (9 vs 5 positions through
one weight stream). This probe times `_verify_accept_program` alone at
bench-like pool shapes across gamma, splitting the round's fixed cost
(dispatch + verdict fetch) from the per-position compute, so the scaling
anomaly is attributed to a program, not a serving-loop effect.

Measurement traps (CLAUDE.md): value-fetch (np.asarray) to synchronize —
block_until_ready lies on the axon backend; one warm call per distinct
gamma first (remote compile).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1b", choices=["1b", "8b"])
    ap.add_argument("--gammas", default="2,4,8,16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ctx", type=int, default=128,
                    help="resident context tokens per lane")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cxl_speckv_tpu.config import KVDtype
    from cxl_speckv_tpu.engine.spec import _verify_accept_program
    from cxl_speckv_tpu.models.configs import llama_3_2_1b, llama_3_8b
    from cxl_speckv_tpu.models.llama import (
        init_params, init_params_quantized)
    from cxl_speckv_tpu.ops.quant import kv_storage_dtype

    on_tpu = jax.default_backend() == "tpu"
    if args.model == "8b":
        config = llama_3_8b()
        params = init_params_quantized(config, jax.random.PRNGKey(0))
    else:
        config = llama_3_2_1b()
        params = init_params(config, jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    B, bs = args.batch, 32
    kv_dtype = KVDtype.INT8
    c = config
    # bench-like pool: the 8B bench arm runs ~99+1 slots
    n_slots = 100
    max_blocks = 8
    elem = kv_storage_dtype(kv_dtype)

    def fresh_pools():
        # DISTINCT scale arrays: the program donates its pool arguments,
        # and donating one buffer through two parameters is invalid; fresh
        # per gamma because donation consumes the previous set
        return (jnp.zeros((c.num_layers, n_slots, c.head_dim,
                           c.num_kv_heads * bs), elem),
                jnp.zeros((c.num_layers, n_slots, c.num_kv_heads, bs,
                           c.head_dim), elem),
                jnp.ones((c.num_layers, n_slots, 1,
                          c.num_kv_heads * bs), jnp.float32),
                jnp.ones((c.num_layers, n_slots, 1,
                          c.num_kv_heads * bs), jnp.float32))
    tables = np.full((B, max_blocks), n_slots - 1, np.int32)
    for b in range(B):
        for i in range(args.ctx // bs + 1):
            tables[b, i] = (b * (args.ctx // bs + 1) + i) % (n_slots - 1)
    start = np.full(B, args.ctx, np.int32)
    active = np.ones(B, bool)
    temps = np.zeros(B, np.float32)
    top_ps = np.zeros(B, np.float32)
    key = jax.random.PRNGKey(1)

    rng = np.random.RandomState(0)
    for g in (int(x) for x in args.gammas.split(",")):
        toks = rng.randint(1, c.vocab_size, (B, g + 1)).astype(np.int32)
        drafts = toks[:, 1:].copy()
        pools = fresh_pools()

        def call(pools):
            out, *rest = _verify_accept_program(
                params, config, kv_dtype, jnp.asarray(toks),
                jnp.asarray(start), *pools, jnp.asarray(tables),
                jnp.asarray(active), None, jnp.asarray(drafts),
                jnp.asarray(temps), jnp.asarray(top_ps), key,
                gamma=g, use_pallas=on_tpu)
            return np.asarray(out), tuple(rest[:4])

        t0 = time.monotonic()
        _, pools2 = call(pools)
        warm = time.monotonic() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            _, pools2 = call(pools2)
            times.append(time.monotonic() - t0)
        print(f"gamma={g:3d} T={g+1:3d} warm={warm:6.1f}s "
              f"round={min(times)*1e3:7.1f} ms (best of {args.reps}: "
              f"{', '.join(f'{t*1e3:.1f}' for t in times)})", flush=True)


if __name__ == "__main__":
    main()
