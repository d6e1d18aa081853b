"""A/B benchmark: dnum-grouped hybrid key-switch vs per-limb gadget
(run manually on TPU; chained-slope methodology, docs/performance.md).

Operands are SYNTHETIC (random residues in key/ciphertext pytrees):
modular-arithmetic cost is value-independent, and eager keygen over the
tunneled TPU costs minutes. Correctness of both gadgets is covered by
tests/test_hybrid_gadget.py. The chain is data-dependent key-switches
(each feeds the next), so the slope isolates ONE engine keyswitch.

Usage:  python -u tools/bench_hybrid.py [--n 8192] [--limbs 12]
One TPU process at a time; do not kill mid-run (wedges the tunnel).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from tools.bench_kernels import slope  # noqa: E402


def _synthetic_key(params, ndig):
    """KeySwitchKey with random dual-form components at the key ring."""
    from toyfhe_tpu.core.ring import RingElt
    from toyfhe_tpu.core.rlwe import KeyComponent, KeySwitchKey
    import jax.numpy as jnp

    ring = params.ring_key
    rng = np.random.default_rng(3)
    lim = min(ring.primes)
    comps = []
    for _ in range(ndig):
        m = jnp.asarray(rng.integers(0, lim, (ring.nlimbs, ring.n),
                                     dtype=np.int64).astype(np.uint32))
        d = jnp.asarray(rng.integers(0, lim, (ring.nlimbs, ring.n),
                                     dtype=np.int64).astype(np.uint32))
        comps.append(KeyComponent(mask=RingElt(dual=m),
                                  masked=RingElt(dual=d)))
    return KeySwitchKey(params, comps, ring)


def _synthetic_ct(params):
    from fractions import Fraction
    from toyfhe_tpu.core.ring import RingElt
    from toyfhe_tpu.core.rlwe import CipherText
    from toyfhe_tpu.core.ckks_encoding import CKKSTag
    import jax.numpy as jnp

    ring = params.ring_cipher
    rng = np.random.default_rng(4)
    lim = min(ring.primes)
    cs = tuple(RingElt(dual=jnp.asarray(
        rng.integers(0, lim, (ring.nlimbs, ring.n),
                     dtype=np.int64).astype(np.uint32))) for _ in range(2))
    return CipherText(params, cs, ring, enc=CKKSTag(Fraction(2) ** 26))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 13)
    ap.add_argument("--limbs", type=int, default=12, help="ct tower depth L")
    ap.add_argument("--dnum", type=int, default=3)
    args = ap.parse_args()

    import jax
    import toyfhe_tpu as F

    n, L, dnum = args.n, args.limbs, args.dnum
    alpha = -(-L // dnum)
    print(f"backend: {jax.default_backend()}  N={n} L={L} "
          f"dnum={dnum} (alpha={alpha})", flush=True)

    def build(name, params, ndig):
        key = _synthetic_key(params, ndig)
        c = _synthetic_ct(params)

        def mk(K):
            @jax.jit
            def f(ct):
                for _ in range(K):
                    ct = F.keyswitch(key, ct)
                return ct.cs[0].dual if ct.cs[0].dual is not None \
                    else ct.cs[0].primal
            return lambda ct: f(ct)
        t = slope(mk, (c,), k1=2, k2=10)
        print(f"{name:>26}: {t * 1e3:8.3f} ms/keyswitch "
              f"({1.0 / t:8.1f} /s)", flush=True)
        return t

    ring_a = F.make_rns_ring(n, (30,) + (26,) * (L - 1) + (30,))
    pa = F.ModulusRaised(F.CKKSParams(ring_a, 0, 3.2))
    ta = build("per-limb (ModulusRaised)", pa, L)

    ring_b = F.make_rns_ring(n, (30,) + (26,) * (L - 1) + (30,) * alpha)
    pb = F.HybridRaised(F.CKKSParams(ring_b, 0, 3.2), dnum, alpha)
    tb = build(f"hybrid dnum={dnum}", pb, dnum)

    print(f"hybrid speedup: {ta / tb:.2f}x", flush=True)


if __name__ == "__main__":
    main()
