"""Speculative-decoding serving throughput on the tiered engine (r5).

The reference is named CXL-**SpecKV**: speculative decoding with the KV
cache in pooled memory is its headline composition (`README.md:14-19`,
`src/cxl_speckv_system.h` wires the prefetcher+pool under a spec-decode
serving loop). Rounds 2-4 pinned the spec path's CORRECTNESS end to end
(greedy spec == plain greedy token-identical, tests/test_spec_decode.py;
on-hw agreement probes, scripts/tpu_spec_check.py) — this script measures
its THROUGHPUT on the real chip, as arms over the same tiered workload
shape as bench.py.

Why spec decode matters on a weight-bound decoder: a plain decode step
streams the whole weight tree from HBM to emit ONE token per lane; a
verify step streams it ONCE to score gamma+1 positions per lane. With
acceptance rate a, spec emits 1 + gamma*a tokens per stream — decode's
arithmetic intensity rises by that factor, which is exactly the lever
the fused-horizon path CANNOT pull (horizon amortizes the dispatch
constant, not the weight stream: 32 fused steps still stream weights 32
times).

Arms:
  plain      no spec, fused decode_horizon (the bench default config)
  ngram      prompt-lookup proposer (zero draft cost, no draft model)
  self       draft model = the target (acceptance-ceiling control: the
             measured ~0.95 decode-vs-verify agreement bounds what any
             perfect draft could deliver while paying gamma full-size
             draft dispatches — it shows the machinery's overhead, never
             a deployable speedup)
  draft      small draft (1B) proposing for the 8B target. Random
             independently-initialized weights give FLOOR acceptance
             (~1/vocab); the arm measures the round's COST structure —
             with it, speedup(a) for a real checkpoint pair is derived
             from measured constants, not simulated ones.

Honest framing of the ngram arm: random-weight greedy generation
degenerates into repetitive cycles, which is the FAVORABLE extreme of
prompt-lookup's regime (extractive / repetitive continuations — the
same regime vLLM's prompt-lookup decoding targets). The measured
acceptance is real, the regime is the proposer's best case, and both
facts are printed. The machine constants (t_round vs t_tok) are
workload-independent.

Usage (real v5e):
  python scripts/spec_bench.py --model 8b            # all arms
  python scripts/spec_bench.py --model 1b --arms plain,ngram --gamma 8
"""

from __future__ import annotations

import argparse
import gc
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build(model_config, params, *, batch, n_requests, prompt_len, gen,
          horizon, use_pallas, weight_dtype, spec=None, gamma=4,
          draft_config=None, draft_params=None, bs=32, prefill_chunk=None,
          quantum=4):
    from cxl_speckv_tpu.config import (
        CacheConfig, EngineConfig, KVDtype, PrefetchConfig, SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine

    max_seq = prompt_len + gen + gamma + bs
    blocks_per_seq = -(-max_seq // bs)
    hbm_blocks = 2 * batch * blocks_per_seq + max(3, blocks_per_seq // 2)
    host_blocks = n_requests * blocks_per_seq + 8
    sc = SystemConfig(
        cache=CacheConfig(block_size=bs, num_hbm_blocks=hbm_blocks,
                          num_host_blocks=host_blocks,
                          kv_dtype=KVDtype("int8"),
                          prefetch_reserve_frac=0.25),
        prefetch=PrefetchConfig(enabled=False, train_online=False),
        engine=EngineConfig(max_batch_size=batch, max_seq_len=max_seq,
                            prefill_chunk=prefill_chunk
                            or min(128, max(32, prompt_len)),
                            decode_horizon=horizon, sched_quantum=quantum,
                            weight_dtype=weight_dtype),
    )
    kw = {}
    if spec == "ngram":
        kw = dict(spec_ngram=True, spec_gamma=gamma)
    elif spec in ("self", "draft"):
        # int8 draft cache: the draft pool is sized for the FULL logical
        # block space (it never tiers), so at 1B-draft scale bf16 costs
        # ~3 GB HBM — the quantized cache halves it and measures the
        # "speculative KV compressed like the target" configuration
        kw = dict(draft_config=draft_config, draft_params=draft_params,
                  spec_gamma=gamma, spec_draft_kv="int8")
    eng = Engine(model_config, sc, params=params, use_pallas=use_pallas,
                 enable_lstm=False, seed=0, **kw)
    import jax
    for a in eng.kvc.pools:
        np.asarray(a[(0,) * a.ndim])
    if eng.kvc.store is not None:
        jax.block_until_ready(eng.kvc.store.arrays)
    return eng, n_requests * blocks_per_seq / hbm_blocks


def run(eng, *, n_requests, prompt_len, gen, seed=0):
    rng = np.random.RandomState(seed)
    vocab = eng.model_config.vocab_size
    for _ in range(n_requests):
        eng.add_request(rng.randint(1, vocab, prompt_len).tolist(),
                        max_new_tokens=gen)
    t0 = time.monotonic()
    outs = eng.run()
    dt = time.monotonic() - t0
    return sum(len(o.tokens) for o in outs), dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, choices=["1b", "8b", "tiny"])
    ap.add_argument("--arms", default="plain,ngram,self,draft")
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--prompt", type=int, default=64)
    ap.add_argument("--gen", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=0,
                    help="plain arm's fused horizon (0 = auto)")
    ap.add_argument("--quantum", type=int, default=4,
                    help="scheduler stint length in ticks. A spec ROUND is "
                    "one tick, so quantum bounds how many rounds amortize a "
                    "group's residency migrations — the spec-path analog of "
                    "the plain arm's fused horizon (which packs "
                    "decode_horizon steps into ONE tick and so amortizes "
                    "in-program instead)")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    import jax

    from cxl_speckv_tpu.models.configs import llama_3_2_1b, llama_3_8b
    from cxl_speckv_tpu.models.llama import (
        init_params, init_params_quantized)

    on_tpu = jax.default_backend() == "tpu"
    model = args.model or ("8b" if on_tpu else "tiny")
    if model == "tiny":
        import dataclasses
        config = dataclasses.replace(
            llama_3_2_1b(), num_layers=2, hidden_size=256,
            intermediate_size=512, vocab_size=1024, num_q_heads=8,
            num_kv_heads=4, head_dim=32, dtype="float32")
        params = init_params(config, jax.random.PRNGKey(0))
        weight_dtype = "native"
        args.batch, args.n = min(args.batch, 2), min(args.n, 8)
        args.prompt, args.gen = min(args.prompt, 32), min(args.gen, 24)
    elif model == "8b":
        config = llama_3_8b()
        params = init_params_quantized(config, jax.random.PRNGKey(0))
        weight_dtype = "int8"   # already-quantized tree: engine serves as-is
    else:
        config = llama_3_2_1b()
        params = init_params(config, jax.random.PRNGKey(0))
        weight_dtype = "int8"
    jax.block_until_ready(params)

    # draft for the cross-scale arm: 1B bf16 proposing for the 8B target
    # (for the 1B target the draft arm reuses the same 1B config with
    # fresh weights — pure cost structure either way at random init)
    draft_cfg = draft_params = None
    arms = [a.strip() for a in args.arms.split(",") if a.strip()]
    if "draft" in arms and model != "tiny":
        draft_cfg = llama_3_2_1b()
        draft_params = init_params(draft_cfg, jax.random.PRNGKey(7))
        jax.block_until_ready(draft_params)
    elif "draft" in arms:
        draft_cfg, draft_params = config, init_params(
            config, jax.random.PRNGKey(7))

    wl = dict(n_requests=args.n, prompt_len=args.prompt, gen=args.gen)
    results = {}
    for arm in arms:
        spec = None if arm == "plain" else arm
        g = args.gamma
        dc, dp = None, None
        if arm == "self":
            dc, dp = config, params
        elif arm == "draft":
            dc, dp = draft_cfg, draft_params
        if arm == "draft" and dc is None:
            print(f"# skip draft arm (no draft model for {model})",
                  file=sys.stderr)
            continue
        horizon = args.horizon if arm == "plain" else 1
        t0 = time.monotonic()
        eng, oversub = build(config, params, batch=args.batch,
                             horizon=horizon, use_pallas=on_tpu,
                             weight_dtype=weight_dtype, spec=spec, gamma=g,
                             draft_config=dc, draft_params=dp,
                             quantum=args.quantum, **wl)
        # warm: full workload once (compiles + remote program caches)
        run(eng, seed=99, **wl)
        print(f"# {arm}: warm done {time.monotonic()-t0:.0f}s",
              file=sys.stderr, flush=True)
        best = None
        for rep in range(args.reps):
            del eng            # free the previous engine's pools before
            gc.collect()       # the rebuild (draft arms run close to HBM)
            eng, oversub = build(config, params, batch=args.batch,
                                 horizon=horizon, use_pallas=on_tpu,
                                 weight_dtype=weight_dtype, spec=spec,
                                 gamma=g, draft_config=dc, draft_params=dp,
                                 quantum=args.quantum, **wl)
            toks, dt = run(eng, seed=0, **wl)
            st = eng.get_statistics()
            row = {"tok_s": toks / dt, "wall_s": dt, "tokens": toks,
                   "hit_rate": st["directory"]["hit_rate"],
                   "migrations": (st["transfer"]["up_transfers"]
                                  + st["transfer"]["down_transfers"]),
                   "decode_s": st["engine"]["decode_time_s"],
                   "phases": {k: {"total_s": round(v.get("total_s", 0.0), 2),
                                  "p50_ms": round(v.get("p50_ms", 0.0), 1),
                                  "p95_ms": round(v.get("p95_ms", 0.0), 1)}
                              for k, v in sorted(st["phases"].items())
                              if v.get("total_s", 0.0) > 0.01}}
            if spec:
                sp = st["spec"]
                row.update(acceptance=sp["acceptance_rate"],
                           tokens_per_round=sp["tokens_per_round"],
                           rounds=sp["rounds"], gamma=g)
                row["round_ms"] = (row["decode_s"] / sp["rounds"] * 1e3
                                   if sp["rounds"] else 0.0)
            else:
                dbatches = st["scheduler"]["decode_batches"]
                row["step_ms"] = (row["decode_s"] / dbatches * 1e3
                                  if dbatches else 0.0)
            best = row if best is None or row["tok_s"] > best["tok_s"] else best
            print(f"# {arm} rep{rep}: {row['tok_s']:.1f} tok/s "
                  + (f"acc={row.get('acceptance', 0):.3f} "
                     f"tok/round={row.get('tokens_per_round', 0):.2f}"
                     if spec else ""), file=sys.stderr, flush=True)
        results[arm] = best
        del eng
        gc.collect()

    # derived machine constants: speedup(a) from measured costs
    out = {"model": model, "gamma": args.gamma, "batch": args.batch,
           "workload": f"{args.n}x{args.prompt}+{args.gen}",
           "quantum": args.quantum,
           "oversubscription": round(oversub, 2), "arms": results}
    if "plain" in results and "ngram" in results:
        # per-lane-token cost of each round type, measured
        plain, ng = results["plain"], results["ngram"]
        t_tok = plain["decode_s"] / plain["tokens"]          # s per token
        t_round = ng["decode_s"] / ng["rounds"]              # s per spec round
        # spec emits (1 + gamma*a) tokens/lane/round across batch lanes;
        # effective per-token cost t_round / (B * (1+gamma*a))
        g = args.gamma
        curve = {f"{a:.1f}": round(
            t_tok / (t_round / (args.batch * (1 + g * a))), 2)
            for a in (0.0, 0.3, 0.5, 0.7, 0.9, 1.0)}
        out["ngram_speedup_vs_plain_at_acceptance"] = curve
        out["measured"] = {"t_tok_ms": round(t_tok * 1e3, 2),
                           "t_round_ms": round(t_round * 1e3, 2)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
