"""Test configuration: run on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py; tests validate correctness and
multi-chip sharding on host CPU per the build environment contract.

Note: this environment's sitecustomize registers a remote-TPU ("axon") PJRT
backend at interpreter startup, so we must override the platform via
jax.config (env vars alone are read too early to change).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
