"""Kernel-level A/B benchmark harness (run manually on TPU).

Compares the engineered NTT paths and the fused key-switch kernel under
the chained-slope methodology (docs/performance.md). Within-run ratios
are the trustworthy signal; absolute numbers carry large session noise.

Usage:  python -u tools/bench_kernels.py [--n 16384] [--limbs 8]
One TPU process at a time; do not kill mid-run (wedges the tunnel).
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def slope(make, args, k1=2, k2=14, reps=9):
    """Min-estimator chained-jit slope: tunnel noise is strictly
    additive (queueing, link stalls), so the minimum over interleaved
    reps estimates true execution time; the slope of the min times
    removes dispatch/transfer constants."""
    f1, f2 = make(k1), make(k2)
    np.asarray(f1(*args))
    np.asarray(f2(*args))
    t1s, t2s = [], []
    for r in range(reps):
        order = ((f1, t1s), (f2, t2s)) if r % 2 == 0 else ((f2, t2s), (f1, t1s))
        for f, acc in order:
            t0 = time.perf_counter()
            np.asarray(f(*args))
            acc.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (k2 - k1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 14)
    ap.add_argument("--limbs", type=int, default=8)
    ap.add_argument("--rows", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from toyfhe_tpu.ops import modmath, ntt as nttmod, ntt_mxu as mxu
    from toyfhe_tpu.ops import ntt_mxu_pallas as mxp, ntt_pallas as npal
    from toyfhe_tpu.utils import numtheory as nt

    n, L, R = args.n, args.limbs, args.rows
    t = nttmod.NttTables(n, nt.ntt_prime_chain(n, tuple([28] * L)))
    mt = mxu.MxuNttTables(t)
    pt = npal.PallasNttTables(t)
    print(f"backend={jax.default_backend()} N={n} L={L} R={R} "
          f"lazy={t.lazy_ok}", flush=True)
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.integers(0, 2 ** 27, (R, L, n)).astype(np.uint32))
    xl = jnp.asarray(np.asarray(xt).transpose(1, 0, 2))
    xr = xl.reshape(L, R, mxp.N1, n // mxp.N1)
    psis = jnp.asarray(np.asarray(mt.psi_pow).reshape(L, mxp.N1, mt.n2))

    def mk_r2(K):
        @jax.jit
        def f(v):
            for _ in range(K):
                v = nttmod.ntt(t, v)
            return v
        return f

    tr = slope(mk_r2, (xt,))
    print(f"radix-2 XLA      : {tr*1e3:8.3f} ms/batch  {R*L/tr:10.0f} tf/s",
          flush=True)

    def mk_mxp(paired):
        def mk(K):
            @jax.jit
            def f(v):
                for _ in range(K):
                    v = mxp.ntt_mxu_pallas(mt, v, psis, False, paired)
                return v
            return f
        return mk

    tm0 = slope(mk_mxp(False), (xr,))
    print(f"MXU-Pallas 7grp  : {tm0*1e3:8.3f} ms/batch  {R*L/tm0:10.0f} tf/s  "
          f"(x{tr/tm0:.2f} vs radix-2)", flush=True)
    tm = slope(mk_mxp(True), (xr,))
    print(f"MXU-Pallas paired: {tm*1e3:8.3f} ms/batch  {R*L/tm:10.0f} tf/s  "
          f"(x{tr/tm:.2f} vs radix-2, x{tm0/tm:.2f} vs 7grp)", flush=True)

    def mk_pm_xla(K):
        @jax.jit
        def f(a, b):
            for _ in range(K):
                a = nttmod.intt(t, modmath.mul_mod(
                    nttmod.ntt(t, a), nttmod.ntt(t, b), t.mp))
            return a
        return f

    tpm = slope(mk_pm_xla, (xt, xt))
    print(f"polymul XLA      : {tpm*1e3:8.3f} ms/op", flush=True)

    def mk_pm_pal(K):
        @jax.jit
        def f(a, b):
            for _ in range(K):
                a = npal.polymul_pallas_raw(pt, a, b, 8)
            return a
        return f

    tpp = slope(mk_pm_pal, (xl, xl))
    print(f"polymul Pallas   : {tpp*1e3:8.3f} ms/op  (x{tpm/tpp:.2f} vs XLA)",
          flush=True)


if __name__ == "__main__":
    main()
