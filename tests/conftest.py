"""Test configuration.

All tests run on CPU with 8 virtual devices so multi-device sharding logic is
exercised without TPU hardware (SURVEY.md section 4 "lesson for the build":
every component testable on CPU, inverting the reference's
hardware-dependence).

Note: this environment's sitecustomize registers a remote-TPU ("axon") JAX
backend at interpreter startup and pins `jax_platforms` via jax.config —
overriding the JAX_PLATFORMS env var is not enough; we must override the
config value too, before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("SPECKV_INTERPRET", "1")  # Pallas kernels in interpreter mode
# Pin the dispatch constant: on a loaded CI machine the auto-horizon
# measurement (utils/dispatch.py) would see an inflated per-dispatch cost
# and derive decode_horizon > 1, changing test scheduling semantics
# run-to-run. 0.05 ms (a realistic local constant) derives horizon 1.
os.environ.setdefault("SPECKV_DISPATCH_MS", "0.05")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
