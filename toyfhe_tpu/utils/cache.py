"""Persistent XLA compilation cache for the TPU serving/bench path.

The serving pipeline's compiles are minutes-scale on the tunneled TPU
(round-4 BASELINE: 522 s primal / 294 s dual for the L=7 pipeline, 872 s
compile+first-run for the N=2^13 refresh), and every fresh process pays
them again. The tests already cache CPU compiles (tests/conftest.py,
measured 2.2×); this helper gives the TPU bench/serving tools the same
persistent cache so a second session reuses the first session's
executables.

The default cache directory is keyed by a host discriminator (machine
arch + CPU-flags hash): XLA AOT entries embed the compiling host's CPU
features, so a checkout shared between machines must not share cache
entries (ADVICE r4). Cache entries are additionally keyed by platform
(cpu/tpu) internally by jax, so CPU tests and TPU serving coexist in
one tree.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_tag() -> str:
    """`<machine>-<8-hex CPU-flags hash>` — one cache subtree per host
    microarchitecture."""
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


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at a persistent compilation cache (thresholds zeroed —
    FHE programs are many small-to-medium compiles). Returns the cache
    dir, or None when this jax has no cache knobs. Respects an explicit
    ``JAX_COMPILATION_CACHE_DIR`` override."""
    import jax

    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(root, ".jax_cache", host_tag()))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return cache_dir
