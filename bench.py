"""Benchmark harness — run on the real TPU chip by the round driver.

Measures the BASELINE.json driver metric: negacyclic NTT limb-transforms
per second per chip at N=2^14, plus key-switch throughput (full
square→relinearize→rescale steps) on the encrypted-MNIST-shaped tower
(N=2^13, 7 limbs, infer.jl:97-110 re-planned to <2^31 limbs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The reference publishes no numbers (README.md:73-79), so vs_baseline is
the ratio against the first recorded value of this same bench
(BENCH_BASELINE.json, written on first run).
"""

import json
import os
import sys
import time

import numpy as np


def _bench_ntt(reps=30, batch=16, L=8, n=1 << 14):
    import jax
    import jax.numpy as jnp

    import toyfhe_tpu as F
    from toyfhe_tpu.ops import ntt as nttmod

    ring = F.make_rns_ring(n, tuple([28] * L))
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 2 ** 27, (batch, L, n)).astype(np.uint32))
    f = jax.jit(lambda a: nttmod.ntt(ring.tables, a))
    f(x).block_until_ready()
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = f(y)
    y.block_until_ready()
    dt = time.perf_counter() - t0
    transforms = reps * batch * L
    return transforms / dt, dt / reps


def _bench_keyswitch(reps=10, batch=4, L=7, n=1 << 13):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as g
    from toyfhe_tpu.parallel import ops as pops

    ring, masks, maskeds, cts = g._build(n_ring=n, logqs=tuple([28] * L),
                                         batch=batch)
    step = pops.make_single_chip_step(ring.tables, masks, maskeds)
    step(cts).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(cts)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return reps * batch / dt, dt / reps


def main():
    import jax
    backend = jax.default_backend()
    ntt_per_s, ntt_t = _bench_ntt()
    ks_per_s, ks_t = _bench_keyswitch()

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    record = {"ntt_per_s": ntt_per_s, "keyswitch_per_s": ks_per_s,
              "backend": backend}
    if os.path.exists(base_path):
        base = json.load(open(base_path))
        vs = ntt_per_s / base["ntt_per_s"] if base.get("ntt_per_s") else 1.0
    else:
        json.dump(record, open(base_path, "w"))
        vs = 1.0

    out = {
        "metric": "ntt_transforms_per_s_chip_n2^14",
        "value": round(ntt_per_s, 1),
        "unit": "limb-NTT/s",
        "vs_baseline": round(vs, 3),
        "keyswitch_per_s": round(ks_per_s, 2),
        "ntt_ms": round(ntt_t * 1e3, 3),
        "keyswitch_ms": round(ks_t * 1e3, 3),
        "backend": backend,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
