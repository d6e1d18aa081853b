"""BEHZ RNS multiplication vs the exact big-integer oracle.

The device BFV multiply (core/behz.py) must equal the reference's
big-ring multiply (bfv.jl:34-40) up to the documented fast-base-
conversion slack: the RNS floor errs by α ∈ [0, L) units per coefficient
(BEHZ §3.3) and rounding ties may differ by 1. We run both on the SAME
ciphertext tensors — the host side via exact Python-integer negacyclic
arithmetic (core/generic_ring.py works for the power-of-two cyclotomic
Φ_{2N} = x^N + 1 with composite modulus) — and assert the per-
coefficient difference bound.
"""

import jax
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import generic_ring as G
from toyfhe_tpu.core import ring as ringops
from toyfhe_tpu.utils import numtheory as nt


def test_behz_matches_bigint_multiply():
    n = 64
    ring = F.make_rns_ring(n, (29, 28))
    pring = F.PlainRing(n, 53)
    params = F.BFVParams(ring, None, pring, 0, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    kp = F.keygen(params, ks[0])
    c1 = F.encrypt(kp, F.scalar_encode(pring, 6), ks[1])
    c2 = F.encrypt(kp, F.scalar_encode(pring, 7), ks[2])

    # device BEHZ tensor+scale
    _, cs = F.core.rlwe.enc_mul(c1, c2) if hasattr(F, "core") else (None, None)
    from toyfhe_tpu.core import rlwe
    _, cs = rlwe.enc_mul(c1, c2)

    # host exact big-ring multiply on the SAME ciphertexts
    q = ring.modulus
    host = G.GenericRing(2 * n, q)          # Φ_{2n}(x) = x^n + 1
    p = 53

    def lift(ct):
        e = ringops.ensure_primal(ring, ct)
        return ring.to_bigint(np.asarray(e.primal))

    a = [lift(x) for x in c1.cs]
    b = [lift(x) for x in c2.cs]
    # tensor product in exact centered integers, then round(p·x/q) mod q
    out = [[0] * n for _ in range(3)]
    for i in range(2):
        ai = [nt.centered(v, q) for v in a[i]]
        for j in range(2):
            bj = [nt.centered(v, q) for v in b[j]]
            prod = [0] * n
            for s in range(n):
                vs = ai[s]
                if vs == 0:
                    continue
                for t in range(n):
                    k = s + t
                    term = vs * bj[t]
                    if k < n:
                        prod[k] += term
                    else:
                        prod[k - n] -= term
            for k in range(n):
                out[i + j][k] += prod[k]
    expect = [[nt.divround(x * p, q) % q for x in comp] for comp in out]

    L = ring.nlimbs
    for comp_idx in range(3):
        got = ring.to_bigint(np.asarray(
            ringops.ensure_primal(ring, cs[comp_idx]).primal))
        for k in range(n):
            d = (got[k] - expect[comp_idx][k]) % q
            d = nt.centered(d, q)
            assert abs(d) <= L + 1, (comp_idx, k, d)
