"""Phase2-only bootstrap probe: feed recorded (or synthetic) post-C2S
slot values into EvalMod on a FRESH ciphertext at the same tower, and
compare against the plain Chebyshev evaluation slot by slot.

Discriminates "EvalMod corrupts specific slots" (reproduces here, no
C2S/ModRaise involved) from "phase1's output ciphertext is special"
(clean here). Round-4 bisection of the N=2^13 refresh failure
(VERDICT round 3, item 1).

Usage: env JAX_PLATFORMS=cpu python -u tools/probe_evalmod.py [logN] [deg]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 59

    import jax
    from fractions import Fraction
    import toyfhe_tpu as F
    from toyfhe_tpu.core import bootstrap as B
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
    ring = (B.make_boot_ring(n, L=L, num_special=k)
            if "--balanced" in sys.argv
            else F.make_rns_ring(n, (29, 29) + (26,) * L + (29,) * k))
    params = F.HybridRaised(
        F.CKKSParams(ring, 0, 3.2, secret="sparse", hamming_weight=h),
        dnum, k)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    kp = F.keygen(params, ks[0])
    ek = rlwe.keygen_eval_mult(ks[1], kp.priv)
    ctx = B.BootstrapContext(ek=ek, gks=None, gk_conj=None, K=K, deg=deg,
                             arcsin=True, scale_limbs=2)

    # post-C2S slot values: recorded phase1 output if available, else a
    # synthetic I + eps pattern including zeros at the edges
    npz = "/tmp/boot_phase_slots.npz"
    if os.path.exists(npz) and logn == 13:
        z = np.load(npz)
        vlo, vhi = z["lo"], z["hi"]
        print("using recorded phase1 slots", flush=True)
    else:
        rng = np.random.default_rng(7)
        ints = rng.integers(-3, 4, d).astype(np.float64)
        vlo = ints + rng.uniform(-0.05, 0.05, d)
        vhi = -ints + rng.uniform(-0.05, 0.05, d)
        vlo[0] = -0.0001
        vlo[-1] = 0.0002
        print("using synthetic slots", flush=True)

    # fresh encrypt at the post-C2S tower (2 base + L - 3*sl*2 level limbs)
    scale = Fraction(2) ** 52
    nl_target = 2 + L - 6          # 3 C2S levels x sl=2 limbs consumed
    t0 = time.time()
    clo = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vlo, scale),
                    ks[2])
    chi = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vhi, scale),
                    ks[3])
    from toyfhe_tpu.core import ckks_encoding as CE
    clo = CE.ct_drop_to(clo, nl_target)
    chi = CE.ct_drop_to(chi, nl_target)
    print(f"encrypt+drop {time.time()-t0:.0f}s  tower {clo.ring.nlimbs}",
          flush=True)

    if "--single" in sys.argv:
        # jit, UNBATCHED, optionally without arcsin: discriminates
        # jit-vs-eager from batched-vs-single from arcsin (the eager
        # unbatched no-arcsin chain is clean to 3.6e-8)
        import math
        arcsin = "--noarcsin" not in sys.argv
        t0 = time.time()

        def one(c_):
            ev_ = B.eval_chebyshev(ctx.ek, c_, ctx.cheb, ctx.K,
                                   scale_limbs=2)
            if arcsin:
                ev_ = B._arcsin_correct(ctx.ek, ev_, 2)
            return ev_
        ev1 = jax.jit(one)(clo)
        print(f"single jit (arcsin={arcsin}) compile+run "
              f"{time.time()-t0:.0f}s", flush=True)
        z1 = F.decrypt(kp, ev1)
        cheb = B.sine_cheb_coeffs(K, deg)
        s = np.polynomial.chebyshev.chebval(np.real(vlo) / K, cheb)
        want = s + ((2 * math.pi) ** 2 / 6.0 * s ** 3 if arcsin else 0)
        err = np.abs(z1 - want)
        bad = np.nonzero(err > 1e-2)[0]
        print(f"single: max dev {err.max():.3e} mean {err.mean():.3e} "
              f"bad {len(bad)} edge devs: [0]={err[0]:.3e} "
              f"[1]={err[1]:.3e} [-1]={err[-1]:.3e}", flush=True)
        return

    if "--arcstep" in sys.argv:
        # decrypt every intermediate of _arcsin_correct on the clean
        # sine output: s2, s3, t3 (6.58 s^3 plain term), t1 (aligned s)
        import math
        from toyfhe_tpu.core import ckks_encoding as CE2

        def steps(c_):
            s = B.eval_chebyshev(ctx.ek, c_, ctx.cheb, ctx.K,
                                 scale_limbs=2)
            s2 = B._mul_ct(ctx.ek, s, s, 2)
            s3 = B._mul_ct(ctx.ek, s2, s, 2)
            c3 = (2.0 * math.pi) ** 2 / 6.0
            t3 = B._plain_term(s3, c3, s3.ring.nlimbs - 2, s3.enc.scale, 2)
            t1 = CE2.ct_to(s, t3.ring.nlimbs, t3.enc.scale)
            return s, s2, s3, t3, t1
        t0 = time.time()
        s, s2, s3, t3, t1 = jax.jit(steps)(clo)
        print(f"arcstep jit {time.time()-t0:.0f}s; towers "
              f"s={s.ring.nlimbs} s3={s3.ring.nlimbs} t3={t3.ring.nlimbs}",
              flush=True)
        cheb = B.sine_cheb_coeffs(K, deg)
        sp = np.polynomial.chebyshev.chebval(np.real(vlo) / K, cheb)
        c3 = (2.0 * math.pi) ** 2 / 6.0
        for name, ct, want in (("s", s, sp), ("s2", s2, sp ** 2),
                               ("s3", s3, sp ** 3), ("t3", t3, c3 * sp ** 3),
                               ("t1", t1, sp)):
            zz = F.decrypt(kp, ct)
            e = np.abs(zz - want)
            print(f"  {name}: max dev {e.max():.3e} mean {e.mean():.3e} "
                  f"edges [0]={e[0]:.3e} [1]={e[1]:.3e} [-1]={e[-1]:.3e}",
                  flush=True)
        return

    if "--rescale" in sys.argv:
        # isolate the alignment machinery: fresh ct dropped to the
        # arcsin-depth tower, then (a) one ct_rescale, (b) a 6-limb
        # ct_to at r = 2^52 — no EvalMod involved at all
        from toyfhe_tpu.core import ckks_encoding as CE2
        import math as _m
        c25 = CE2.ct_drop_to(clo, 25)
        dropped = _m.prod(c25.ring.primes[19:25])
        target = Fraction(2) ** 52 * Fraction(c25.enc.scale) / dropped

        def steps(c_):
            r1 = rlwe.ct_rescale(c_)
            r2 = rlwe.ct_rescale(r1)
            t = CE2.ct_to(c_, 19, target)
            return r1, r2, t
        t0 = time.time()
        r1, r2, t = jax.jit(steps)(c25)
        print(f"rescale probe jit {time.time()-t0:.0f}s", flush=True)
        for name, ct in (("rescale1", r1), ("rescale2", r2),
                         ("ct_to19", t)):
            zz = F.decrypt(kp, ct)
            e = np.abs(zz - vlo)
            print(f"  {name}: max dev {e.max():.3e} mean {e.mean():.3e} "
                  f"edges [0]={e[0]:.3e} [1]={e[1]:.3e} [-1]={e[-1]:.3e}",
                  flush=True)
        return

    if "--trace" in sys.argv:
        # abstract trace only: runs all host-side scale algebra (and the
        # TOYFHE_DEBUG_SCALES diagnostics) without compiling anything
        t0 = time.time()
        jax.eval_shape(lambda l, h_: B.bootstrap_phase2(ctx, l, h_),
                       clo, chi)
        print(f"abstract trace {time.time()-t0:.0f}s — done", flush=True)
        return

    t0 = time.time()
    fn = jax.jit(lambda ctx_, l, h_: B.bootstrap_phase2(ctx_, l, h_))
    ev = fn(ctx, clo, chi)
    print(f"phase2 jit compile+run {time.time()-t0:.0f}s", flush=True)

    z0 = F.decrypt(kp, rlwe.ct_index(ev, 0))
    z1 = F.decrypt(kp, rlwe.ct_index(ev, 1))

    # plain reference: arcsin-corrected sine of the input slots
    cheb = B.sine_cheb_coeffs(K, deg)
    import math
    for name, vin, zout in (("lo", vlo, z0), ("hi", vhi, z1)):
        s = np.polynomial.chebyshev.chebval(vin / K, cheb)
        want = s + (2 * math.pi) ** 2 / 6.0 * s ** 3
        err = np.abs(zout - want)
        bad = np.nonzero(err > 1e-2)[0]
        print(f"{name}: max dev {err.max():.3e} mean {err.mean():.3e} "
              f"bad slots {len(bad)}: {bad[:8]}", flush=True)
        for j in list(bad[:4]):
            print(f"   slot {j}: in={vin[j]:.5f} want={want[j]:.5f} "
                  f"got={zout[j]:.5f}", flush=True)


if __name__ == "__main__":
    main()
