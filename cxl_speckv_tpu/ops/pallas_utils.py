"""Shared helpers for Pallas kernels."""

from __future__ import annotations

import functools
import os

import jax


@functools.cache
def interpret_mode() -> bool:
    """Run Pallas kernels in interpreter mode?

    True when SPECKV_INTERPRET=1 (tests) or when the default backend is not
    TPU — the CPU fallback that keeps every kernel testable without hardware
    (SURVEY.md section 4 lesson; the reference's suite is unrunnable without
    an FPGA, we invert that).
    """
    env = os.environ.get("SPECKV_INTERPRET")
    if env is not None:
        return env == "1"
    return jax.default_backend() != "tpu"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
