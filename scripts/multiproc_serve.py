"""REAL multi-process distributed serving run (SURVEY.md section 2.6).

Spawns N actual OS processes, each `jax.distributed.initialize`-d against a
localhost coordinator (CPU backend, Gloo cross-process collectives), builds
ONE global dp x tp mesh spanning all processes' devices, and serves a
lockstep round through `JaxProcessTransport` — the same transport a real
multi-host TPU pod uses (multihost_utils.process_allgather over DCN).

This executes the paths a single-process virtual mesh cannot:
  - jax.distributed bring-up (parallel/distributed.py:initialize_multihost)
  - the pickled-command allgather (parallel/lockstep.py:JaxProcessTransport)
  - GSPMD programs whose arrays span non-addressable devices, including the
    replicate-then-fetch host pull (parallel/sharding.py:host_fetch)

Each process submits a DIFFERENT set of client requests in a different
local order; the lockstep merge must still produce byte-identical engine
command streams, hence byte-identical generated tokens on every process.

Usage:
  python scripts/multiproc_serve.py                # launcher: spawn 2 workers
  python scripts/multiproc_serve.py --nprocs 2 --rank 0 --port 29901  # worker

The launcher writes MULTIPROC_r03.json at the repo root recording
process_count, mesh shape, and the cross-process identity check.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LOCAL_DEVICES = 2          # per process; nprocs * LOCAL_DEVICES global
DP, TP = 2, 2              # dp across processes (DCN leg), tp within (ICI leg)
                           # (tiny_test_config has 2 kv heads -> tp max 2)


def worker(rank: int, nprocs: int, port: int, out_path: str,
           use_pallas: bool) -> None:
    # env is prepared by the launcher; assert the platform stuck (the
    # sitecustomize axon backend must not initialize in workers)
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from cxl_speckv_tpu.parallel.distributed import initialize_multihost

    assert initialize_multihost(f"localhost:{port}", nprocs, rank)
    assert jax.process_count() == nprocs
    assert jax.device_count() == nprocs * LOCAL_DEVICES
    assert jax.local_device_count() == LOCAL_DEVICES

    import numpy as np

    from cxl_speckv_tpu.config import (CacheConfig, EngineConfig, KVDtype,
                                       ParallelConfig, PrefetchConfig,
                                       SystemConfig)
    from cxl_speckv_tpu.engine.engine import Engine
    from cxl_speckv_tpu.models.configs import tiny_test_config
    from cxl_speckv_tpu.models.llama import init_params
    from cxl_speckv_tpu.parallel.lockstep import (JaxProcessTransport,
                                                  LockstepFrontend)

    cfg = tiny_test_config()
    # identical on every process: same seed -> same jitted init -> same bits
    params = init_params(cfg, jax.random.PRNGKey(7))
    sc = SystemConfig(
        cache=CacheConfig(block_size=8, num_hbm_blocks=24, num_host_blocks=64,
                          kv_dtype=KVDtype.INT8),
        prefetch=PrefetchConfig(depth=2),
        engine=EngineConfig(max_batch_size=4, max_seq_len=96,
                            prefill_chunk=32, decode_horizon=2),
        parallel=ParallelConfig(dp=DP, tp=TP),
    )
    eng = Engine(cfg, sc, params=params, use_pallas=use_pallas,
                 enable_lstm=False, seed=0)
    assert eng.mesh is not None and eng.mesh.devices.size == nprocs * LOCAL_DEVICES

    front = LockstepFrontend(eng, rank, JaxProcessTransport())

    # each process's clients submit DIFFERENT prompts (seeded by rank) in a
    # different local order, exercising the FULL replicated command surface:
    # sampling knobs, stops, logprobs, sessions, and cancellation
    rng = np.random.RandomState(100 + rank)
    for i in range(3):
        prompt = rng.randint(1, cfg.vocab_size, 6 + 3 * rank + i).tolist()
        front.submit(prompt, max_new_tokens=8,
                     temperature=0.0 if i % 2 == 0 else 0.8,
                     top_p=1.0 if i % 2 == 0 else 0.9,
                     logprobs=2 if i == 0 else 0)
    h_sess = front.submit(rng.randint(1, cfg.vocab_size, 8).tolist(),
                          max_new_tokens=4, session=True) if rank == 0 else None
    h_dead = front.submit([7, 7, 7], max_new_tokens=40, ignore_eos=True)
    front.set_prefetch_depth(3)
    front.commit_round()          # allgather barrier: the lockstep round

    # cancel a committed request mid-serve (replicates the engine req_id)
    for _ in range(2):
        front.step()
    front.cancel(h_dead)
    front.commit_round()
    res = {o.req_id: (o.tokens, o.finish_reason, o.logprobs)
           for o in front.run()}

    # round 2: a session continuation + fresh submissions
    # the session's CLIENT lives on rank 0; every rank's engine knows the
    # session (replicated), but only its owner submits the next turn
    sid = next((o.session_id for o in eng._requests.values()
                if getattr(o, "session", False) and o.session_id >= 0), None)
    if rank == 0 and sid is not None:
        front.continue_session(sid, [30, 31, 32], max_new_tokens=4)
    rng2 = np.random.RandomState(200 + rank)
    front.submit(rng2.randint(1, cfg.vocab_size, 10).tolist(),
                 max_new_tokens=6)
    front.commit_round()
    res.update({o.req_id: (o.tokens, o.finish_reason, o.logprobs)
                for o in front.run()})
    # fold ALL cancelled requests' terminal state into the digest (every
    # rank cancelled its own; both replicate to both engines)
    assert front.req_id(h_dead) in eng._requests
    for r in eng._requests.values():
        if r.finish_reason == "cancelled":
            res[r.req_id] = (list(r.output), r.finish_reason, None)
    outs = res

    digest = hashlib.sha256(
        repr(sorted(outs.items())).encode()).hexdigest()
    with open(out_path, "w") as f:
        json.dump({"rank": rank, "process_count": jax.process_count(),
                   "global_devices": jax.device_count(),
                   "outputs": {str(k): v for k, v in sorted(outs.items())},
                   "digest": digest}, f)
    print(f"rank {rank}: {len(outs)} requests served, digest {digest[:16]}",
          flush=True)


def launch(nprocs: int, port: int, use_pallas: bool,
           artifact: str | None) -> int:
    procs, outs = [], []
    for rank in range(nprocs):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
        env["SPECKV_INTERPRET"] = "1"
        out_path = f"/tmp/speckv_mp_rank{rank}.json"
        outs.append(out_path)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--rank", str(rank), "--nprocs", str(nprocs),
             "--port", str(port), "--out", out_path]
            + (["--pallas"] if use_pallas else []),
            env=env, cwd=REPO))
    rcs = [p.wait(timeout=600) for p in procs]
    if any(rcs):
        print(f"FAIL: worker return codes {rcs}")
        return 1
    results = [json.load(open(p)) for p in outs]
    digests = {r["digest"] for r in results}
    identical = len(digests) == 1
    record = {
        "process_count": nprocs,
        "local_devices_per_process": LOCAL_DEVICES,
        "global_devices": results[0]["global_devices"],
        "mesh": f"dp={DP} x tp={TP} (dp across processes)",
        "transport": "JaxProcessTransport (process_allgather / Gloo-CPU)",
        "command_surface": "submit(temperature/top_p/logprobs/ignore_eos) "
                           "+ session + continue_session + cancel + depth",
        "use_pallas": use_pallas,
        "requests_served": len(results[0]["outputs"]),
        "outputs_identical_across_processes": identical,
        "digest": results[0]["digest"],
    }
    print(json.dumps(record, indent=2))
    if artifact:
        with open(artifact, "w") as f:
            json.dump(record, f, indent=2)
    return 0 if identical else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=29901)
    ap.add_argument("--out", default="/tmp/speckv_mp.json")
    ap.add_argument("--pallas", action="store_true",
                    help="serve with the shard-mapped Pallas kernels "
                         "(interpreter mode on CPU)")
    ap.add_argument("--artifact", default=None,
                    help="write the launcher record to this path")
    args = ap.parse_args()
    if args.rank is None:
        return launch(args.nprocs, args.port, args.pallas, args.artifact)
    worker(args.rank, args.nprocs, args.port, args.out, args.pallas)
    return 0


if __name__ == "__main__":
    sys.exit(main())
