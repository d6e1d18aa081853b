"""Decrypt the bootstrap phase boundaries at production N (CPU).

Localizes a refresh numerics failure: phase1 output slots should be
(coeff/q₀ + I) with |I| ≤ (h+1)/2; phase2 output ≈ the fractional part
ε; phase3 = the refreshed message. Prints slot statistics per phase.

Usage: env JAX_PLATFORMS=cpu python -u tools/probe_boot_phases.py [logN]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13

    import jax
    from fractions import Fraction
    import toyfhe_tpu as F
    from toyfhe_tpu.core import bootstrap as B

    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    n = 1 << logn
    d = n // 2
    h = 8
    K = 6.0
    deg = 59
    L = 46
    dnum = 5
    lct = 2 + L
    alpha = -(-lct // dnum)
    k = alpha + 1
    ring = B.make_boot_ring(n, L=L, num_special=k)
    params = F.HybridRaised(
        F.CKKSParams(ring, 0, 3.2, secret="sparse", hamming_weight=h),
        dnum, k)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    kp = F.keygen(params, ks[0])
    t0 = time.time()
    ctx = B.setup_bootstrap(ks[1], kp.priv, K=K, deg=deg, radix=16,
                            arcsin=True, scale_limbs=2)
    print(f"setup {time.time()-t0:.0f}s", flush=True)
    rng = np.random.default_rng(3)
    vals = (rng.uniform(-1, 1, d) + 1j * rng.uniform(-1, 1, d)) * 0.7
    scale = Fraction(2) ** 52
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals, scale),
                  ks[2])
    while c.ring.nlimbs > 2:
        c = F.ct_modswitch_drop(c)

    t0 = time.time()
    i1, i2, i3, _ = B.trace_plain_cache_phased(ctx, c)
    print(f"phase trace {time.time()-t0:.0f}s", flush=True)
    run = B.jit_bootstrap_replay_phased(ctx, c)
    f1, f2, f3 = run.phases

    t0 = time.time()
    lo, hi = f1(ctx, c, i1)
    print(f"phase1 (compile+run) {time.time()-t0:.0f}s", flush=True)
    for name, ct in (("lo", lo), ("hi", hi)):
        z = F.decrypt(kp, ct)
        print(f"  {name}: |slot| max={np.abs(z).max():.3f} "
              f"mean={np.abs(z).mean():.3f} (expect ≤ ~K={K})", flush=True)

    t0 = time.time()
    ev = f2(ctx, lo, hi, i2)
    print(f"phase2 (compile+run) {time.time()-t0:.0f}s", flush=True)
    from toyfhe_tpu.core import rlwe
    for i, name in ((0, "ev_lo"), (1, "ev_hi")):
        z = F.decrypt(kp, rlwe.ct_index(ev, i))
        print(f"  {name}: |slot| max={np.abs(z).max():.4f} "
              f"mean={np.abs(z).mean():.4f}", flush=True)

    t0 = time.time()
    out = f3(ctx, ev, i3)
    print(f"phase3 (compile+run) {time.time()-t0:.0f}s", flush=True)
    z = F.decrypt(kp, out)
    err = np.abs(z - vals)
    print(f"  refresh err: max={err.max():.3e} mean={err.mean():.3e} "
          f"frac>1e-3={float((err > 1e-3).mean()):.4f}", flush=True)

    # per-slot dump for offline analysis (no recompiles)
    zlo = F.decrypt(kp, lo)
    zhi = F.decrypt(kp, hi)
    ev0 = F.decrypt(kp, rlwe.ct_index(ev, 0))
    ev1 = F.decrypt(kp, rlwe.ct_index(ev, 1))
    np.savez("/tmp/boot_phase_slots.npz", lo=zlo, hi=zhi, ev0=ev0,
             ev1=ev1, out=z, vals=vals)
    bad = np.abs(ev0) > 1.0
    print(f"  bad ev_lo slots: {int(bad.sum())}/{len(ev0)}; "
          f"example idx {np.nonzero(bad)[0][:5]}", flush=True)
    if bad.any():
        idx = np.nonzero(bad)[0][:5]
        for j in idx:
            print(f"    slot {j}: lo={zlo[j]:.4f} ev={ev0[j]:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
