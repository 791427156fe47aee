"""REAL multi-process distributed execution (scripts/multiproc_serve.py).

Unlike every other test (single process, virtual 8-device mesh), this one
spawns 2 actual OS processes, each jax.distributed-initialized against a
localhost coordinator, builds ONE global dp=2 x tp=2 mesh spanning both
processes, and serves two lockstep rounds through JaxProcessTransport —
the process_allgather transport a real multi-host pod uses (SURVEY.md
section 2.6; VERDICT r2 Missing #1).

The workers manage their own env/backends (CPU + Gloo); this test only
launches and checks the cross-process identity record.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "multiproc_serve.py")


def _launch(tmp_path, mode, port):
    artifact = tmp_path / f"mp_{mode}.json"
    env = dict(os.environ)
    # the launcher builds per-worker envs itself; scrub ours so the
    # xdist worker's 8-device XLA_FLAGS doesn't leak into the workers
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, SCRIPT, "--port", str(port), "--mode", mode,
         "--artifact", str(artifact)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    return json.loads(artifact.read_text())[mode]


def test_two_process_lockstep_serving(tmp_path):
    rec = _launch(tmp_path, "dptp", 29911)
    assert rec["process_count"] == 2
    assert rec["global_devices"] == 4
    assert rec["outputs_identical_across_processes"] is True
    # 2x3 plain + 2 penalized + session + 2 dead (cancelled)
    # + continuation + 2 fresh
    assert rec["requests_served"] == 14


def test_two_process_tp_spanning_mesh(tmp_path):
    """r4 (VERDICT r3 next-step #7): the tp axis SPANS the two processes
    (1 local device each), so the model programs' tensor-parallel
    collectives cross the process fabric on every dispatch — asserted
    token-identical across ranks AND vs a single-process tp=2 reference."""
    rec = _launch(tmp_path, "tpspan", 29921)
    assert rec["process_count"] == 2
    assert rec["global_devices"] == 2
    assert rec["local_devices_per_process"] == 1
    assert rec["outputs_identical_across_processes"] is True
    assert rec["matches_single_process_reference"] is True
    assert rec["requests_served"] == 14
