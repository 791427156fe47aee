"""Headline benchmark: multi-turn session serving with tiered KV.

The reference system's reason to exist (README.md:16-19): per-request KV
persists in pooled memory between accesses and is *restored* instead of
recomputed. We measure exactly that on TPU:

- treatment: HBM pool + host-DRAM tier; idle sessions' KV demotes to host
  and is promoted back (prefetched) when the conversation returns.
- baseline: HBM-only with the SAME HBM pool; idle session KV is reclaimed
  under capacity pressure and every returning turn re-prefills its history.

Workload: S concurrent multi-turn conversations, T turns each, fixed new
prompt + generation per turn. Both runs use identical engine geometry (same
jit programs — first execution of each distinct program costs tens of
seconds on remote-dispatch TPU runtimes, so the warmup engine covers them).

Prints ONE JSON line:
  {"metric": ..., "value": total serving throughput tok/s (treatment),
   "unit": "tok/s", "vs_baseline": treatment/baseline}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_engine(model_config, params, *, hbm_blocks, host_blocks, batch,
                 max_seq_len, horizon, use_pallas):
    from cxl_speckv_tpu.config import (
        CacheConfig, EngineConfig, KVDtype, PrefetchConfig, SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine

    sc = SystemConfig(
        cache=CacheConfig(block_size=32, num_hbm_blocks=hbm_blocks,
                          num_host_blocks=host_blocks, kv_dtype=KVDtype.INT8,
                          prefetch_reserve_frac=0.1),
        prefetch=PrefetchConfig(depth=4),
        engine=EngineConfig(max_batch_size=batch, max_seq_len=max_seq_len,
                            prefill_chunk=256, decode_horizon=horizon),
    )
    return Engine(model_config, sc, params=params, use_pallas=use_pallas,
                  enable_lstm=False, seed=0)


def run_sessions(eng, *, n_sessions, turns, turn_prompt, gen, seed=0):
    """Serve the whole multi-turn workload; returns (total_new_tokens, dt)."""
    rng = np.random.RandomState(seed)
    vocab = eng.model_config.vocab_size
    t0 = time.monotonic()
    sids = [eng.add_request(rng.randint(1, vocab, turn_prompt).tolist(),
                            max_new_tokens=gen, session=True)
            for _ in range(n_sessions)]
    total = sum(len(o.tokens) for o in eng.run())
    for _ in range(turns - 1):
        for sid in sids:
            eng.continue_session(sid, rng.randint(1, vocab, turn_prompt).tolist(),
                                 max_new_tokens=gen)
        total += sum(len(o.tokens) for o in eng.run())
    dt = time.monotonic() - t0
    return total, dt


def main():
    import jax

    from cxl_speckv_tpu.models.configs import llama_3_2_1b
    from cxl_speckv_tpu.models.llama import init_params

    on_tpu = jax.default_backend() == "tpu"
    config = llama_3_2_1b()
    if not on_tpu:
        import dataclasses
        config = dataclasses.replace(config, num_layers=2, hidden_size=256,
                                     intermediate_size=512, vocab_size=1024,
                                     num_q_heads=8, num_kv_heads=4, head_dim=32,
                                     dtype="float32")
    params = init_params(config, jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    if on_tpu:
        n_sessions, turns, turn_prompt, gen = 8, 5, 224, 32
        batch, horizon, bs = 2, 8, 32
    else:
        n_sessions, turns, turn_prompt, gen = 4, 3, 48, 8
        batch, horizon, bs = 2, 4, 32
    per_turn = turn_prompt + gen
    max_seq = turns * per_turn + 64
    blocks_per_session = -(-max_seq // bs)
    # HBM sized for the active batch + ~half an idle session; total session
    # demand is ~3-4x this — the oversubscription the host tier absorbs
    hbm_blocks = batch * blocks_per_session + blocks_per_session // 2 + 2
    host_blocks = n_sessions * blocks_per_session + 8

    geo = dict(hbm_blocks=hbm_blocks, batch=batch, max_seq_len=max_seq,
               horizon=horizon, use_pallas=on_tpu)
    print(f"# geometry: hbm={hbm_blocks} host={host_blocks} "
          f"blocks/session={blocks_per_session} sessions={n_sessions}",
          file=sys.stderr)

    # warmup engine (same geometry -> same jit programs, incl. migrations)
    t0 = time.monotonic()
    warm = build_engine(config, params, host_blocks=host_blocks, **geo)
    run_sessions(warm, n_sessions=3, turns=2, turn_prompt=turn_prompt,
                 gen=horizon, seed=99)
    print(f"# warmup {time.monotonic()-t0:.0f}s", file=sys.stderr)

    eng_t = build_engine(config, params, host_blocks=host_blocks, **geo)
    tok_t, dt_t = run_sessions(eng_t, n_sessions=n_sessions, turns=turns,
                               turn_prompt=turn_prompt, gen=gen)
    st = eng_t.get_statistics()

    eng_b = build_engine(config, params, host_blocks=0, **geo)
    tok_b, dt_b = run_sessions(eng_b, n_sessions=n_sessions, turns=turns,
                               turn_prompt=turn_prompt, gen=gen)
    sb = eng_b.get_statistics()

    tps_t, tps_b = tok_t / dt_t, tok_b / dt_b
    restores = sum(s.restores for s in eng_t._sessions.values())
    reprefills_b = sum(s.reprefills for s in eng_b._sessions.values())
    print(json.dumps({
        "metric": "session_serving_throughput_tiered_kv_int8",
        "value": round(tps_t, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps_t / tps_b, 3) if tps_b > 0 else None,
    }))
    print(
        f"# treatment: {tok_t} tok / {dt_t:.1f}s = {tps_t:.1f} tok/s | "
        f"restores={restores} hit_rate={st['directory']['hit_rate']:.3f} "
        f"up/down={st['transfer']['up_transfers']}/{st['transfer']['down_transfers']} "
        f"prefill_chunks={st['scheduler']['prefill_chunks']} || "
        f"baseline: {tok_b} tok / {dt_b:.1f}s = {tps_b:.1f} tok/s | "
        f"reprefills={reprefills_b} "
        f"prefill_chunks={sb['scheduler']['prefill_chunks']}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
