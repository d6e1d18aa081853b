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

# Persistent XLA compilation cache: the default tier's wall time is
# dominated by thousands of small CPU jit compiles (engine primitives
# per tower shape), so cache them across runs — measured 2.2× on warm
# reruns (55.5s → 24.8s for test_reference_vectors alone). Thresholds
# zeroed because almost every compile here is individually below the
# 1s/default-size cutoffs. Respect an explicit env override.
#
# The default dir is keyed by a host-architecture discriminator (ADVICE
# r4): XLA AOT entries embed the compiling host's CPU features, so a
# checkout shared between machines (containers, network volumes) could
# load entries compiled for another host's ISA and SIGILL. machine() +
# a cheap CPU-flags hash keeps each host in its own subdirectory.
def _host_tag():
    import hashlib
    import platform
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith("flags"):
                    feats = ln
                    break
    except OSError:
        pass
    h = hashlib.sha256(feats.encode()).hexdigest()[:8]
    return f"{platform.machine()}-{h}"


_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache", _host_tag()))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:  # older jax without the knobs — run uncached
    pass
