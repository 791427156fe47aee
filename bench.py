"""Headline benchmark: decode throughput at 4x KV oversubscription.

Measures the reference's headline capability (BASELINE.md: 3.2x decode
throughput vs GPU-only by serving more concurrent requests from pooled
memory) on TPU:

- baseline: HBM-only — the HBM block pool fits only `BASE_BATCH` sequences'
  KV, so only that many decode concurrently (no host tier).
- treatment: same HBM pool + host-DRAM tier at 4x oversubscription with the
  prefetcher — `OVER_BATCH` concurrent sequences, KV blocks streaming
  host<->HBM under the round-robin schedule.

Prints ONE JSON line:
  {"metric": ..., "value": tok/s (treatment), "unit": "tok/s",
   "vs_baseline": treatment/baseline}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_engine(model_config, params, *, hbm_blocks, host_blocks, batch,
                 max_seq_len, use_pallas, enable_prefetch=True):
    import jax

    from cxl_speckv_tpu.config import (
        CacheConfig, EngineConfig, KVDtype, PrefetchConfig, SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine

    sc = SystemConfig(
        cache=CacheConfig(block_size=32, num_hbm_blocks=hbm_blocks,
                          num_host_blocks=host_blocks, kv_dtype=KVDtype.INT8,
                          prefetch_reserve_frac=0.1),
        prefetch=PrefetchConfig(depth=4, enabled=enable_prefetch),
        engine=EngineConfig(max_batch_size=batch, max_seq_len=max_seq_len,
                            prefill_chunk=256),
    )
    return Engine(model_config, sc, params=params, use_pallas=use_pallas,
                  enable_lstm=False, seed=0)


def run_workload(eng, prompts, gen_tokens):
    for p in prompts:
        eng.add_request(p, max_new_tokens=gen_tokens)
    t0 = time.monotonic()
    outs = eng.run()
    dt = time.monotonic() - t0
    toks = sum(len(o.tokens) for o in outs)
    return toks, dt, eng.get_statistics()


def main():
    import jax

    from cxl_speckv_tpu.models.configs import llama_3_2_1b
    from cxl_speckv_tpu.models.llama import init_params

    on_tpu = jax.default_backend() == "tpu"
    config = llama_3_2_1b()
    if not on_tpu:
        # CPU smoke mode: shrink everything
        import dataclasses
        config = dataclasses.replace(config, num_layers=2, hidden_size=256,
                                     intermediate_size=512, vocab_size=1024,
                                     num_q_heads=8, num_kv_heads=4, head_dim=32,
                                     dtype="float32")
    params = init_params(config, jax.random.PRNGKey(0))

    prompt_len = 512 if on_tpu else 64
    gen_tokens = 128 if on_tpu else 16
    max_seq = prompt_len + gen_tokens + 32
    blocks_per_seq = -(-max_seq // 32)
    base_batch = 2
    over_batch = 8
    n_requests = over_batch * 2
    # HBM sized to exactly base_batch sequences (+reserve margin)
    hbm_blocks = int(base_batch * blocks_per_seq * 1.15) + 2
    host_blocks = blocks_per_seq * n_requests + 8  # 4x+ oversubscription

    rng = np.random.RandomState(0)
    prompts = [rng.randint(1, config.vocab_size, prompt_len).tolist()
               for _ in range(n_requests)]

    # -- treatment: oversubscribed + tiered + prefetch ----------------------
    eng = build_engine(config, params, hbm_blocks=hbm_blocks,
                       host_blocks=host_blocks, batch=over_batch,
                       max_seq_len=max_seq, use_pallas=on_tpu)
    # warmup: compile paths
    wtoks, wdt, _ = run_workload(
        build_engine(config, params, hbm_blocks=hbm_blocks,
                     host_blocks=host_blocks, batch=over_batch,
                     max_seq_len=max_seq, use_pallas=on_tpu),
        prompts[:2], 8)
    toks_t, dt_t, stats_t = run_workload(eng, prompts, gen_tokens)

    # -- baseline: HBM-only, what fits decodes -----------------------------
    engb = build_engine(config, params, hbm_blocks=hbm_blocks, host_blocks=0,
                        batch=base_batch, max_seq_len=max_seq,
                        use_pallas=on_tpu, enable_prefetch=False)
    toks_b, dt_b, stats_b = run_workload(engb, prompts, gen_tokens)

    tps_t = toks_t / dt_t
    tps_b = toks_b / dt_b
    result = {
        "metric": "decode_throughput_4x_oversubscribed_int8kv",
        "value": round(tps_t, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps_t / tps_b, 3) if tps_b > 0 else None,
    }
    print(json.dumps(result))
    print(
        f"# treatment: {toks_t} tok in {dt_t:.1f}s ({tps_t:.1f} tok/s), "
        f"hit_rate={stats_t['directory']['hit_rate']:.3f}, "
        f"demand_fetches={stats_t['runtime']['demand_fetch_blocks']}, "
        f"migrations up/down={stats_t['transfer']['up_transfers']}/"
        f"{stats_t['transfer']['down_transfers']} | "
        f"baseline: {toks_b} tok in {dt_b:.1f}s ({tps_b:.1f} tok/s)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
