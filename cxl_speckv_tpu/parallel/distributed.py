"""Multi-host initialization (DCN).

The inter-host leg of the communication stack (SURVEY.md section 5,
"distributed communication backend"): `jax.distributed.initialize` wires the
hosts; the same `make_mesh` then spans all hosts' devices, with XLA routing
the tp axis over ICI and the dp axis over DCN when laid out host-major.

The 2-host v5e-16 BASELINE configuration maps to:

    initialize_multihost(coordinator, num_processes=2, process_id=rank)
    mesh = make_mesh(dp=2, tp=8)   # dp across hosts (DCN), tp within (ICI)

Single-host (or this repo's CI) skips initialization entirely — `make_mesh`
over local devices is the degenerate case.
"""

from __future__ import annotations

import jax


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host slice. Returns True when
    multi-host mode is active. On TPU pods with env-provided topology all
    arguments may be None (auto-detected)."""
    if num_processes is not None and num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def host_major_devices():
    """Devices ordered host-major so a (dp=hosts, tp=local) mesh puts dp on
    DCN and tp on ICI — collectives ride the fast fabric."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return devs
