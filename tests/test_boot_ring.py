"""Composite-scale stability: the N=2^13 bootstrap root-cause fix.

The composite CKKS equilibrium scale' = scale²/pair DOUBLES any
log-deficit per multiplicative level. The reference-style upward prime
walk (crt.jl:282-295 semantics) puts every level pair ABOVE 2^52; at
N=2^13 the ≡1 mod 2N lattice is coarse enough (spacing 2N·O(ln p)) that
the compounded deficit collapses the working scale from 2^52 to ~2^13
inside EvalMod, where the modswitch rounding bias (an all-ones
coefficient polynomial whose decode spikes ∝1/g at the slot-orbit wrap)
destroys the refresh — the round-3 "err 1.5e3" failure. The fix is
parameter hygiene: balanced level pairs straddling 2^26
(numtheory.balanced_pair_primes / bootstrap.make_boot_ring), plus a
loud collapse guard in the evaluator (bootstrap._rescale_k).
"""

import math
from fractions import Fraction

import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import bootstrap as B
from toyfhe_tpu.utils import numtheory as nt


def _simulate_deficit(pairs, levels):
    """log2 working-scale deficit after ``levels`` muls, consuming pairs
    from the END (e' = 2e − d, d = log2(pair) − 52)."""
    ds = [math.log2(p) - 52 for p in pairs]
    e = 0.0
    for d in ds[-levels:][::-1]:
        e = 2 * e - d
    return abs(e)


@pytest.mark.parametrize("logn", [11, 13])
def test_balanced_pairs_stay_pinned(logn):
    n = 1 << logn
    primes = nt.balanced_pair_primes(n, 23, 26)
    assert len(set(primes)) == 46
    for p in primes:
        assert p % (2 * n) == 1 and nt.is_prime(p)
    pairs = [primes[2 * i] * primes[2 * i + 1] for i in range(23)]
    worst = max(abs(math.log2(p) - 52) for p in pairs)
    assert worst < 0.05, f"pair deficit {worst:.3f} bits"
    # the compounded deficit over a deg-59 EvalMod (~10 mul levels) must
    # keep the working scale in the healthy band
    assert _simulate_deficit(pairs, 10) < 3.0


def test_reference_walk_collapses_at_2e13():
    """The upward walk's pairs at N=2^13 compound past 20 bits of
    deficit — the documented failure; the balanced pairs do not."""
    n = 1 << 13
    up = nt.ntt_prime_chain(n, (26,) * 46)
    up_pairs = [up[2 * i] * up[2 * i + 1] for i in range(23)]
    assert _simulate_deficit(up_pairs, 10) > 20.0
    bal = nt.balanced_pair_primes(n, 23, 26)
    bal_pairs = [bal[2 * i] * bal[2 * i + 1] for i in range(23)]
    assert _simulate_deficit(bal_pairs, 10) < 3.0


def test_make_boot_ring_shape():
    ring = B.make_boot_ring(64, L=8, num_special=3)
    assert ring.nlimbs == 2 + 8 + 3
    ps = ring.primes
    assert all(p >> 28 for p in ps[:2])            # 29-bit base
    assert all(p >> 28 for p in ps[-3:])           # 29-bit specials
    for i in range(4):
        pair = ps[2 + 2 * i] * ps[3 + 2 * i]
        assert abs(math.log2(pair) - 52) < 0.1
    assert len(set(ps)) == ring.nlimbs


def test_rescale_collapse_guard():
    """_rescale_k raises loudly when the working scale has collapsed
    instead of silently corrupting the refresh."""
    import jax

    ring = F.make_rns_ring(32, (28, 28, 28, 28))
    params = F.CKKSParams(ring, 0, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    kp = F.keygen(params, ks[0])
    from toyfhe_tpu.core import ckks_encoding as CE
    c = F.encrypt(kp, F.make_plaintext(ring, np.ones(16) * 0.5,
                                       Fraction(2) ** 27), ks[1])
    low = CE.retag(c, Fraction(2) ** 45)   # post-2-rescale scale ~2^-11
    with pytest.raises(ValueError, match="collapsed"):
        B._rescale_k(low, 2)
