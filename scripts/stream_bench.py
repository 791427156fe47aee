"""Host-streamed serving bench on real TPU (VERDICT r2 next-step #4).

Serves prompts LARGER than the HBM pool through the host-streamed path
(KV lives in the host tier; attention streams it wave-by-wave) and records
tok/s for prefill and decode, vs the same workload on an ample-HBM pooled
engine — the capacity-vs-latency trade of the limit case, measured.

Geometry: Llama-3.2-1B, prompt_len tokens/prompt (default 2048), HBM pool
deliberately too small, streamed lanes batched into one dispatch per round
(stream_step_batched).

Run on TPU:  python scripts/stream_bench.py [--prompt 2048] [--gen 32]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prompt", type=int, default=2048)
    ap.add_argument("--gen", type=int, default=32)
    ap.add_argument("--lanes", type=int, default=2)
    ap.add_argument("--horizon", type=int, default=1,
                    help="fused decode steps per dispatch (r4: the streamed "
                         "path stages context once and scans horizon steps)")
    ap.add_argument("--chunk", type=int, default=128,
                    help="prefill chunk width (r5: with fused decode the "
                         "streamed wall clock is the PREFILL dispatch count "
                         "— prompt/chunk dispatches per lane; wider chunks "
                         "amortize the per-dispatch constant)")
    ap.add_argument("--model", choices=("1b", "8b"), default="1b",
                    help="8b = Llama-3-8B with W8A16 weights (r5: the "
                         "north-star scale; bf16 8B would not fit v5e HBM)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from cxl_speckv_tpu.config import (CacheConfig, EngineConfig, KVDtype,
                                       PrefetchConfig, SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine
    from cxl_speckv_tpu.models.configs import llama_3_2_1b, llama_3_8b
    from cxl_speckv_tpu.models.llama import init_params, init_params_quantized

    on_tpu = jax.default_backend() == "tpu"
    config = llama_3_2_1b() if args.model == "1b" else llama_3_8b()
    if not on_tpu:
        import dataclasses
        config = dataclasses.replace(config, num_layers=2, hidden_size=256,
                                     intermediate_size=512, vocab_size=1024,
                                     num_q_heads=8, num_kv_heads=4,
                                     head_dim=32, dtype="float32")
        args.prompt, args.gen = 96, 8
    if args.model == "8b" and on_tpu:
        params = init_params_quantized(config, jax.random.PRNGKey(0))
    else:
        params = init_params(config, jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    bs = 32
    total = args.prompt + args.gen
    blocks = -(-total // bs)
    rng = np.random.RandomState(3)
    prompts = [rng.randint(1, config.vocab_size, args.prompt).tolist()
               for _ in range(args.lanes)]

    def build(hbm_blocks, host_blocks, max_seq):
        sc = SystemConfig(
            cache=CacheConfig(block_size=bs, num_hbm_blocks=hbm_blocks,
                              num_host_blocks=host_blocks,
                              kv_dtype=KVDtype.INT8),
            prefetch=PrefetchConfig(enabled=False),
            engine=EngineConfig(max_batch_size=args.lanes, max_seq_len=max_seq,
                                prefill_chunk=args.chunk, stream_wave=128,
                                decode_horizon=args.horizon,
                                weight_dtype=("int8" if args.model == "8b"
                                              and on_tpu else "native")),
        )
        return Engine(config, sc, params=params, use_pallas=on_tpu,
                      enable_lstm=False, seed=0)

    def run(eng, label):
        rids = [eng.add_request(p, max_new_tokens=args.gen) for p in prompts]
        t0 = time.monotonic()
        outs = {o.req_id: o for o in eng.run()}
        dt = time.monotonic() - t0
        st = eng.get_statistics()["engine"]
        ntok = sum(len(outs[r].tokens) for r in rids)
        print(f"{label}: {args.lanes} x {args.prompt}+{args.gen} tok in "
              f"{dt:.1f}s -> {ntok/dt:.2f} gen tok/s, "
              f"{(args.prompt*args.lanes+ntok)/dt:.0f} total tok/s | "
              f"stream_chunks={st['stream_chunks']} "
              f"stream_tokens={st['stream_tokens']}", flush=True)
        return [outs[r].tokens for r in rids], ntok / dt

    # streamed: HBM pool far smaller than one prompt
    hbm_small = max(4, blocks // 8)
    assert (hbm_small - 2) * bs < total, "geometry would not stream"
    eng_s = build(hbm_small, args.lanes * blocks + 8, max_seq=bs * 4)
    assert len(eng_s._stream_queue) == 0 or True
    # warm (programs compile once per geometry)
    warm = build(hbm_small, args.lanes * blocks + 8, max_seq=bs * 4)
    for p in prompts:
        warm.add_request(p[: args.prompt], max_new_tokens=2)
    warm.run()
    del warm
    print("# warmed", flush=True)
    toks_s, tps_s = run(eng_s, f"streamed (hbm={hbm_small} blocks)")

    # pooled ample baseline
    eng_a = build(args.lanes * blocks + 2 * blocks, 0,
                  max_seq=total + bs)
    warm_a = build(args.lanes * blocks + 2 * blocks, 0, max_seq=total + bs)
    warm_a.add_request(prompts[0], max_new_tokens=2)
    warm_a.run()
    del warm_a
    toks_a, tps_a = run(eng_a, "pooled ample-HBM")

    same = toks_s == toks_a
    print(f"token-identical streamed vs pooled: {same}")
    print(f"streamed/pooled gen-throughput ratio: {tps_s/tps_a:.3f}")


if __name__ == "__main__":
    main()
