"""Eager BATCHED EvalMod probe: same config as probe_evalmod_eager but
running bootstrap_phase2 on the ct_stack([lo, hi]) batch — the exact
production path. The unbatched eager run is clean (probe_evalmod_eager),
so if this one corrupts the edge slots the bug is in the batched ops.

Usage: env JAX_PLATFORMS=cpu python -u tools/probe_evalmod_batched.py [logN]
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
    ctx = B.BootstrapContext(ek=ek, gks=None, gk_conj=None, K=K, deg=deg,
                             arcsin=True, scale_limbs=2)

    npz = "/tmp/boot_phase_slots.npz"
    z = np.load(npz)
    vlo, vhi = z["lo"], z["hi"]

    scale = Fraction(2) ** 52
    nl_target = 2 + L - 6
    clo = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vlo, scale),
                    ks[2])
    chi = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vhi, scale),
                    ks[3])
    clo = CE.ct_drop_to(clo, nl_target)
    chi = CE.ct_drop_to(chi, nl_target)
    print(f"tower {clo.ring.nlimbs}", flush=True)

    cheb = B.sine_cheb_coeffs(K, deg)

    def dev(ct, vin, name):
        zz = F.decrypt(kp, ct)
        s = np.polynomial.chebyshev.chebval(np.real(vin) / K, cheb)
        want = s + (2 * math.pi) ** 2 / 6.0 * s ** 3
        e = np.abs(zz - want)
        j = int(np.argmax(e))
        print(f"{name}: max dev {e.max():.3e} mean {e.mean():.3e} "
              f"argmax slot {j} edge devs: [0]={e[0]:.3e} [1]={e[1]:.3e} "
              f"[-1]={e[-1]:.3e}", flush=True)

    with jax.disable_jit():
        t0 = time.time()
        ev = B.bootstrap_phase2(ctx, clo, chi)
        print(f"batched phase2 eager {time.time()-t0:.0f}s", flush=True)
        dev(rlwe.ct_index(ev, 0), vlo, "ev_lo")
        dev(rlwe.ct_index(ev, 1), vhi, "ev_hi")


if __name__ == "__main__":
    main()
