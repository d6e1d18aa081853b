"""Tracing / metrics / observability.

The reference's only metric is the BFV noise budget (SURVEY §5). Here:

  * **op counters** — every NTT/INTT, key switch, rescale and tensor
    product increments a process-wide counter, giving per-workload op
    census (e.g. "this encrypted matmul = 64 key switches = 3136
    limb-NTTs") without any tracing infrastructure;
  * **profiler traces** — thin wrapper over jax.profiler for TensorBoard
    trace capture;
  * **roofline helpers** — analytic bytes/flops models for the hot
    kernels so measured times can be compared against hardware limits.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict, Iterator

counters: Dict[str, int] = collections.defaultdict(int)
timers: Dict[str, float] = collections.defaultdict(float)


def count(name: str, n: int = 1) -> None:
    counters[name] += n


def reset() -> None:
    counters.clear()
    timers.clear()


def snapshot() -> Dict[str, int]:
    return dict(counters)


@contextlib.contextmanager
def timed(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        timers[name] += time.perf_counter() - t0


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# rooflines (per chip)
# ---------------------------------------------------------------------------

def ntt_bytes(n: int, nlimbs: int, batch: int = 1) -> int:
    """Minimum HBM traffic of a batched limb-NTT (read + write once;
    stages stay in VMEM when batch·N·4B fits)."""
    return 2 * batch * nlimbs * n * 4


def keyswitch_bytes(n: int, nlimbs: int, ndigits: int | None = None) -> int:
    """Minimum HBM traffic of one key switch: read ct component, read key
    (2·ndig·L rows), write two components. Digit tensors are assumed
    VMEM-resident (the fused-kernel target)."""
    nd = ndigits if ndigits is not None else nlimbs
    rows = 1 + 2 * nd * nlimbs + 2 * nlimbs
    return rows * n * 4


def seconds_at_roofline(nbytes: int, hbm_gbps: float = 819.0) -> float:
    return nbytes / (hbm_gbps * 1e9)
