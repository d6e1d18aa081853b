"""Same-session A/B: merged-call fused key-switch vs the round-3 fused
schedule.

Round-3 VERDICT item 4 names per-op scheduling around the ~61 small
kernels as a remaining MFU term and suggests "batching limb rows across
ops into fewer pallas_calls". ``make_hybrid_fused_step(merge_calls=True)``
does exactly that, bit-identically: the FBC computes only the
out-of-group rows, all dnum per-group digit NTTs ride ONE row-view
pallas call (33 rows at the MNIST shape instead of 4 calls of 8-9), and
the k-special + last-data-row INTTs merge into one call — transform
call sites per step drop 6 → 4.

Both flavors are built on identical synthetic keys, verified bit-equal
ON DEVICE, then timed by the chained-slope method in one process (the
only comparison the tunnel's session variance permits).

Usage: python -u tools/bench_merged_ks.py [logN] [L] [dnum] [k] [batch]
       (defaults 13 7 4 3 4 — the MNIST-shaped bench.py config)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _chains(fn, x, L, k_long=7, k_short=1):
    import jax
    from toyfhe_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()   # persistent XLA cache: warm 2nd-session compiles

    def chain(k):
        @jax.jit
        def f(c):
            for _ in range(k):
                out = fn(c)
                c = c.at[:, :, : L - 1, :].set(out[:, :, : L - 1, :])
            return c
        return f

    jl, js = chain(k_long), chain(k_short)
    np.asarray(jl(x)); np.asarray(js(x))      # compile both
    return js, jl, x, k_long - k_short


def _slopes_interleaved(flavors, reps=9):
    """Time ALL flavors inside one rep loop, round-robin, so a tunnel
    drift on the minutes scale hits every flavor equally — sequential
    per-flavor timing measured a 6× phantom ratio on a volatile session
    (2026-08-21). Returns min-estimator slope per flavor."""
    times = {name: ([], []) for name, _ in flavors}
    for r in range(reps):
        for name, (js, jl, x, _) in flavors:
            order = ((js, 0), (jl, 1)) if r % 2 == 0 else ((jl, 1), (js, 0))
            for f, slot in order:
                t0 = time.perf_counter()
                np.asarray(f(x))
                times[name][slot].append(time.perf_counter() - t0)
    out = {}
    for name, (_, _, _, dk) in flavors:
        ts, tl = times[name]
        out[name] = (min(tl) - min(ts)) / dk
    return out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    dnum = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    import jax

    import bench
    from toyfhe_tpu.parallel import ops as pops

    print(f"backend={jax.default_backend()} N=2^{logn} L={L} dnum={dnum} "
          f"k={k} batch={batch}", flush=True)
    params, ek, cts = bench._make_hybrid_fixture(batch, L, 1 << logn, dnum, k)

    s_v1, _ = pops.make_hybrid_fused_step(params, ek, merge_calls=False)
    s_v2, _ = pops.make_hybrid_fused_step(params, ek, merge_calls=True)

    y0, y1 = np.asarray(s_v1(cts)), np.asarray(s_v2(cts))
    assert np.array_equal(y0, y1), "merged schedule diverged on device"
    print("bit-equal on device OK", flush=True)

    # --- alternative gadget plan: dnum=2, α=4, k=4 specials ---
    # Same keyswitch job (L-limb relinearize), different hybrid plan:
    # transform census 61 → 46 and the key-contraction/FBC elementwise
    # rows drop dnum·T = 40 → 22. The price is a wider raised tower
    # (k=4) and the usual fewer-digits noise trade (the digit magnitude
    # grows with α; P grows with k to compensate — core/noise.py rules).
    p2, e2, c2 = bench._make_hybrid_fixture(batch, L, 1 << logn, 2, 4)
    s_d2, _ = pops.make_hybrid_fused_step(p2, e2, merge_calls=True)
    np.asarray(s_d2(c2))

    flavors = [("fused_r3", _chains(s_v1, cts, L)),
               ("merged", _chains(s_v2, cts, L)),
               ("merged_dnum2", _chains(s_d2, c2, L))]
    sl = _slopes_interleaved(flavors)
    t1, t2, t3 = sl["fused_r3"], sl["merged"], sl["merged_dnum2"]
    print(f"fused (r3, 6 call sites):  {t1 * 1e3:.3f} ms/step  "
          f"({batch / t1:.0f} ct/s)", flush=True)
    print(f"merged  (4 call sites):    {t2 * 1e3:.3f} ms/step  "
          f"({batch / t2:.0f} ct/s)  [{t1 / t2:.3f}x]", flush=True)
    print(f"merged dnum=2 k=4 (46-transform census): {t3 * 1e3:.3f} "
          f"ms/step  ({batch / t3:.0f} ct/s)  [{t1 / t3:.3f}x vs r3 "
          f"fused]", flush=True)

    print(json.dumps({"metric": "merged_vs_fused_keyswitch",
                      "ratio": round(t1 / t2, 3),
                      "fused_ms": round(t1 * 1e3, 3),
                      "merged_ms": round(t2 * 1e3, 3),
                      "merged_dnum2_ms": round(t3 * 1e3, 3),
                      "dnum2_vs_fused": round(t1 / t3, 3),
                      "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
