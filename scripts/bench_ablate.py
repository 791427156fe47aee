"""Driver-shape ablation + variance instrumentation (VERDICT r2 #7/#9,
r3 next-step #1).

Runs a tiered workload three ways and dumps per-run phase timers, so two
questions get measured answers:

1. What does the LSTM buy? (weak #8/#7)
     lstm   — tiered serving, prefetch gated+ranked by the LSTM, online
              training active (the bench.py treatment arm)
     nolstm — tiered serving, schedule-lookahead prefetch only (no
              predictor at all)
     noprefetch — tiered serving with the prefetcher disabled (demand
              fetches only): the floor
2. Where does tiered-side variance come from? (weak #1 / next-step #9)
     every run prints its engine phase summary (decode/prefill/
     maintain.plan/maintain.train/maintain.kvc p50/p95/total) so a slow
     run names its slow phase instead of "tunnel drift".

Two regimes (r4):

--regime smooth  — the bench.py geometry: sticky quantum (4), short
    contexts, HBM double-buffered. Here r3 measured demand fetches nearly
    free (in-graph chaining) and prefetch a net cost.
--regime thrash  — the stall-prone geometry prefetch exists for: quantum=1
    (the decode set rotates EVERY round), long contexts (10 blocks/seq),
    HBM sized to barely double-buffer — every round swaps a whole group
    in/out, so the demand path pays the migrate program on the round's
    critical device path while the prefetch path overlaps it with the
    host's inter-round gap.

Run on TPU:  python scripts/bench_ablate.py [--reps 3] [--regime thrash]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--regime", choices=("smooth", "thrash"),
                    default="smooth")
    args = ap.parse_args()

    import jax

    import bench
    from cxl_speckv_tpu.models.configs import llama_3_2_1b
    from cxl_speckv_tpu.models.llama import init_params

    on_tpu = jax.default_backend() == "tpu"
    config = llama_3_2_1b()
    if not on_tpu:
        import dataclasses
        config = dataclasses.replace(config, num_layers=2, hidden_size=256,
                                     intermediate_size=512, vocab_size=1024,
                                     num_q_heads=8, num_kv_heads=4,
                                     head_dim=32, dtype="float32")
    params = init_params(config, jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    if args.regime == "thrash":
        # stall-prone regime: every round rotates the decode set (quantum
        # 1) and each sequence is 10 blocks, so each round must swap a
        # whole group host<->HBM; HBM barely double-buffers.
        if on_tpu:
            n_requests, prompt_len, gen = 16, 224, 32
            batch, horizon, quantum, bs = 4, 8, 1, 32
        else:
            n_requests, prompt_len, gen = 8, 56, 16
            batch, horizon, quantum, bs = 2, 4, 1, 8
    elif on_tpu:
        n_requests, prompt_len, gen = 32, 64, 64
        batch, horizon, quantum, bs = 4, 16, 4, 32
    else:
        n_requests, prompt_len, gen = 6, 24, 12
        batch, horizon, quantum, bs = 2, 4, 3, 32
    max_seq = prompt_len + gen + bs
    blocks_per_seq = -(-max_seq // bs)
    hbm_blocks = 2 * batch * blocks_per_seq + max(3, blocks_per_seq // 2)
    geo = dict(hbm_blocks=hbm_blocks,
               host_blocks=n_requests * blocks_per_seq + 8, batch=batch,
               max_seq_len=max_seq, horizon=horizon, quantum=quantum,
               use_pallas=on_tpu, block_size=bs)
    print(f"# regime={args.regime}: {n_requests} seqs x {prompt_len}+{gen}, "
          f"batch={batch} horizon={horizon} quantum={quantum} "
          f"hbm={hbm_blocks} blocks ({blocks_per_seq}/seq)", file=sys.stderr)
    modes = {
        # r5: "lstm" runs the in-graph pcont path (the LSTM's continue
        # probability rides the fused decode program — no host worker);
        # "lstm-host" is the r3/r4 configuration with the async CPU pcont
        # worker, kept as the contention-tax comparison arm
        "lstm": dict(prefetch=True, lstm=True),
        "lstm-host": dict(prefetch=True, lstm=True, ingraph_pcont=False),
        "nolstm": dict(prefetch=True, lstm=False),
        "noprefetch": dict(prefetch=False, lstm=False),
    }

    # warm every mode's programs once (same pool geometry -> shared cache)
    t0 = time.monotonic()
    for kw in modes.values():
        e = bench.build_engine(config, params, **geo, **kw)
        bench.run_workload(e, n_requests=n_requests, prompt_len=prompt_len,
                           gen=gen, seed=99)
        del e
    print(f"# warmup {time.monotonic()-t0:.0f}s", file=sys.stderr)

    results: dict[str, list[float]] = {m: [] for m in modes}
    for rep in range(args.reps):
        for mode, kw in modes.items():
            eng = bench.build_engine(config, params, **geo, **kw)
            tok, dt = bench.run_workload(
                eng, n_requests=n_requests, prompt_len=prompt_len, gen=gen)
            st = eng.get_statistics()
            d = st["directory"]
            results[mode].append(tok / dt)
            ph = st["phases"]
            phase_str = " ".join(
                f"{k}:p50={v['p50_ms']:.0f} p95={v['p95_ms']:.0f} "
                f"tot={v.get('total_s', v.get('total_ms', 0)):.2f}"
                for k, v in sorted(ph.items()))
            print(f"{mode:10s} rep{rep}: {tok/dt:7.1f} tok/s "
                  f"hit={d['hit_rate']:.3f} acc={d['prefetch_accuracy']:.2f} "
                  f"miss={d['demand_misses']} "
                  f"up/down={st['transfer']['up_transfers']}/"
                  f"{st['transfer']['down_transfers']}",
                  flush=True)
            print(f"    phases: {phase_str}", flush=True)

    print("\n# summary (tok/s per rep)")
    for mode, vals in results.items():
        print(f"{mode:10s}: {['%.1f' % v for v in vals]}  "
              f"mean {sum(vals)/len(vals):.1f}")


if __name__ == "__main__":
    main()
