"""Eager EvalMod bisection: decrypt every Chebyshev basis element and
PS stage against plain math, at the failing N=2^13 composite tower.

Usage: env JAX_PLATFORMS=cpu python -u tools/probe_evalmod_eager.py [logN]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    deg = 59

    import jax
    import math
    from fractions import Fraction
    import toyfhe_tpu as F
    from toyfhe_tpu.core import bootstrap as B
    from toyfhe_tpu.core import ckks_encoding as CE
    from toyfhe_tpu.core import rlwe

    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    n = 1 << logn
    d = n // 2
    h = 8
    K = 6.0
    L = 46
    dnum = 5
    lct = 2 + L
    alpha = -(-lct // dnum)
    k = alpha + 1
    ring = F.make_rns_ring(n, (29, 29) + (26,) * L + (29,) * k)
    params = F.HybridRaised(
        F.CKKSParams(ring, 0, 3.2, secret="sparse", hamming_weight=h),
        dnum, k)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    kp = F.keygen(params, ks[0])
    ek = rlwe.keygen_eval_mult(ks[1], kp.priv)

    npz = "/tmp/boot_phase_slots.npz"
    if os.path.exists(npz) and logn == 13:
        vlo = np.load(npz)["lo"]
        print("using recorded phase1 slots", flush=True)
    else:
        rng = np.random.default_rng(7)
        ints = rng.integers(-3, 4, d).astype(np.float64)
        vlo = ints + rng.uniform(-0.05, 0.05, d)

    scale = Fraction(2) ** 52
    nl_target = 2 + L - 6
    clo = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vlo, scale),
                    ks[2])
    clo = CE.ct_drop_to(clo, nl_target)
    print(f"tower {clo.ring.nlimbs}", flush=True)

    yv = np.real(vlo) / K

    def dev(ct, want, name):
        z = F.decrypt(kp, ct)
        e = np.abs(z - want)
        j = int(np.argmax(e))
        print(f"{name}: max dev {e.max():.3e} mean {e.mean():.3e} "
              f"argmax slot {j} (got {z[j]:.5f} want {want[j]:.5f}) "
              f"edge devs: [0]={e[0]:.3e} [1]={e[1]:.3e} [-1]={e[-1]:.3e}",
              flush=True)

    with jax.disable_jit():
        t0 = time.time()
        p2 = math.prod(clo.ring.primes[-2:])
        y = B._rescale_k(CE.mul_plain_scalar_at(clo, 1.0 / K, p2), 2)
        dev(y, yv, f"y ({time.time()-t0:.0f}s)")

        basis = B.ChebBasis(ek, y, 2)
        for i in (2, 3, 4, 5, 6, 12, 24, 48):
            t0 = time.time()
            ti = basis.get(i)
            Tw = np.polynomial.chebyshev.chebval(
                yv, [0] * i + [1])
            dev(ti, Tw, f"T_{i} ({time.time()-t0:.0f}s)")

        cheb = B.sine_cheb_coeffs(K, deg)
        kk = max(2, math.isqrt((deg + 1) // 2) + 1)
        t0 = time.time()
        ct, const = B._ps_recurse(basis, [float(a) for a in cheb], kk)
        if abs(const) > 1e-13:
            ct = CE.add_plain(ct, const)
        sv = np.polynomial.chebyshev.chebval(yv, cheb)
        dev(ct, sv, f"ps_sine ({time.time()-t0:.0f}s)")

        t0 = time.time()
        ev = B._arcsin_correct(ek, ct, 2)
        want = sv + (2 * math.pi) ** 2 / 6.0 * sv ** 3
        dev(ev, want, f"arcsin ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
