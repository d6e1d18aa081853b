"""Same-session A/B: fused MXU hybrid key-switch vs the XLA schedule.

Both flavors of make_hybrid_sharded_step (fused=True/False) are built on
identical keys/operands, verified bit-equal ON DEVICE, then timed by the
chained-slope method (docs/performance.md) in one process — the only
comparison the tunnel's session variance permits.

Usage: python -u tools/bench_fused_ks.py [logN] [L] [dnum] [k] [batch]
       (defaults 13 7 4 3 4 — the MNIST-shaped bench.py config)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _slope(fn, x, k_long=24, k_short=8):
    import jax

    def chain(c, k):
        for _ in range(k):
            c = fn(c)
        return c

    import jax.numpy as jnp
    jl = jax.jit(lambda c: chain(c, k_long))
    js = jax.jit(lambda c: chain(c, k_short))
    np.asarray(jl(x)); np.asarray(js(x))      # compile both
    best = None
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(jl(x)); tl = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(js(x)); ts = time.perf_counter() - t0
        est = (tl - ts) / (k_long - k_short)
        best = est if best is None else min(best, est)
    return best


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    dnum = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    import jax
    import jax.numpy as jnp
    import toyfhe_tpu as F
    from toyfhe_tpu.parallel import ops as pops

    n = 1 << logn
    print(f"backend={jax.default_backend()} N=2^{logn} L={L} dnum={dnum} "
          f"k={k} batch={batch}", flush=True)
    ring = F.make_rns_ring(n, tuple([28] * L + [29] * k))
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), dnum, k)
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    t0 = time.time()
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    print(f"keygen: {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    lim = min(params.ring_cipher.primes)
    x = jnp.asarray(rng.integers(0, lim, (batch, 2, L, n)).astype(np.uint32))

    step0, _ = pops.make_hybrid_sharded_step(None, params, ek)
    step1, _ = pops.make_hybrid_sharded_step(None, params, ek, fused=True)

    y0 = np.asarray(step0(x))
    y1 = np.asarray(step1(x))
    assert np.array_equal(y0, y1), "fused step diverged on device"
    print("bit-equal on device OK", flush=True)

    t_un = _slope(step0, x)
    t_fu = _slope(step1, x)
    print(f"unfused: {t_un * 1e3:.3f} ms/step  "
          f"({batch / t_un:.0f} ct/s)", flush=True)
    print(f"fused:   {t_fu * 1e3:.3f} ms/step  "
          f"({batch / t_fu:.0f} ct/s)", flush=True)
    print(f"ratio:   {t_un / t_fu:.2f}x", flush=True)


if __name__ == "__main__":
    main()
