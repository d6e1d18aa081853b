"""PolyCRT encoding + generic-cyclotomic (host backend) scenario tests.

Mirrors test/polycrt_encoding.jl (Φ7 over 𝔽2, slots β+1 / β²+1, no
crypto) and test/bfv_uint8.jl (prime cyclotomic with ≥ 4 slots over
ℤ/256 via Hensel, BFV encrypt → square → decrypt slotwise).
"""

import random

import numpy as np

from toyfhe_tpu.core import generic_ring as G
from toyfhe_tpu.core.polycrt import PolyCRTContext
from toyfhe_tpu.utils import numtheory as nt


def test_cyclotomic_poly():
    assert G.cyclotomic_poly(7) == [1] * 7              # 1+x+...+x^6
    assert G.cyclotomic_poly(8) == [1, 0, 0, 0, 1]      # x^4+1
    assert G.cyclotomic_poly(12) == [1, 0, -1, 0, 1]    # x^4-x^2+1


def test_factor_fp():
    # Φ7 over F2 = (x^3+x+1)(x^3+x^2+1)
    facs = G.factor_squarefree_fp(G.poly_mod_q(G.cyclotomic_poly(7), 2), 2)
    assert sorted(facs) == sorted([[1, 1, 0, 1], [1, 0, 1, 1]])


def test_hensel_lift():
    # lift Φ7's factorization to mod 2^8 and check the product
    phi = G.poly_mod_q(G.cyclotomic_poly(7), 256)
    base = G.factor_squarefree_fp(G.poly_mod_q(G.cyclotomic_poly(7), 2), 2)
    lifted = G.hensel_lift_factors(phi, base, 2, 8)
    prod = [1]
    for f in lifted:
        prod = G._poly_mul_int(prod, f)
    assert G.poly_mod_q(prod, 256) == phi
    for f, f0 in zip(lifted, base):
        assert G.poly_mod_q(f, 2) == f0


def test_polycrt_encoding_phi7():
    """test/polycrt_encoding.jl: slots β+1, β²+1 round-trip, Φ7 over 𝔽2."""
    ctx = PolyCRTContext(7, 2)
    assert ctx.nslots == 2 and ctx.d == 3
    slots = [[1, 1, 0], [1, 0, 1]]        # β+1, β²+1
    coeffs = ctx.encode(slots)
    dec = ctx.decode(coeffs)
    assert dec[0] == [1, 1, 0]
    assert dec[1] == [1, 0, 1]


def test_polycrt_encoding_hensel():
    """Integer slots round-trip + slotwise product over ℤ/256 (the
    bfv_uint8 plaintext space)."""
    m = _find_cyclotomic(3, 2)
    assert m == 31
    ctx = PolyCRTContext(m, 2, 8)
    assert ctx.nslots >= 4
    vals = [1, 2, 3, 4, 5, 6][:ctx.nslots]
    coeffs = ctx.encode(vals)
    dec = ctx.decode(coeffs)
    for v, s in zip(vals, dec):
        assert s[0] == v and all(x == 0 for x in s[1:])
    # slotwise product: encode(v)·encode(v) mod (Φ, 256) decodes to v²
    ring = G.GenericRing(m, 256)
    sq = ring.mul(coeffs, coeffs)
    dec2 = ctx.decode(sq)
    for v, s in zip(vals, dec2):
        assert s[0] == v * v % 256


def _find_cyclotomic(nslots: int, p: int) -> int:
    """find_cyclotomic from test/bfv_uint8.jl:20-31: first prime m whose
    Φm has more than nslots factors over 𝔽p."""
    m = 2
    while True:
        m = nt.next_prime(m + 1)
        d = 1
        while pow(p, d, m) != 1:
            d += 1
        if (m - 1) // d > nslots:
            return m


def test_bfv_uint8():
    """test/bfv_uint8.jl: host BFV over the prime cyclotomic ring, p=256
    PolyCRT slots, encrypt → square → decrypt slotwise."""
    m = _find_cyclotomic(3, 2)
    q = nt.next_prime(2 ** 51 + 1)
    qbig = nt.next_prime(2 ** 111 + 1)
    ring = G.GenericRing(m, q)
    ring_big = G.GenericRing(m, qbig)
    scheme = G.HostBFV(ring, ring_big, 256)
    ctx = PolyCRTContext(m, 2, 8)

    rng = random.Random(42)
    kp = scheme.keygen(rng)
    vals = [1, 2, 3, 4, 5, 6]
    plain = ctx.encode(vals)
    c = scheme.encrypt(kp, plain, rng)
    assert ctx.decode(scheme.decrypt(kp, c))[:6] == [[v] + [0] * (ctx.d - 1) for v in vals]
    csq = scheme.mul(c, c)
    dec = ctx.decode(scheme.decrypt(kp, csq))
    assert [s[0] for s in dec[:6]] == [1, 4, 9, 16, 25, 36]


def test_bfv_uint8_relin_rotate():
    """VERDICT item 5: the ring-generic engine over a general cyclotomic
    — relinearize after multiply and rotate PolyCRT slots on the prime
    cyclotomic of test/bfv_uint8.jl (reference gets these for free from
    Julia dispatch over nemo.jl rings, rlwe_she.jl:273-360)."""
    from toyfhe_tpu.core import host_engine as HE

    m = _find_cyclotomic(3, 2)                  # 31
    q = nt.next_prime(2 ** 51 + 1)
    qbig = nt.next_prime(2 ** 111 + 1)
    params = HE.HostParams(ring=G.GenericRing(m, q), scheme="bfv", p=256,
                           ring_big=G.GenericRing(m, qbig),
                           relin_window=1, delta=q // 256)
    ctx = PolyCRTContext(m, 2, 8)
    rng = random.Random(99)
    kp = HE.keygen(params, rng)
    ek = HE.keygen_eval_mult(params, kp, rng)

    vals = [1, 2, 3, 4, 5, 6][:ctx.nslots]
    c = HE.encrypt(params, kp, ctx.encode(vals), rng)

    # relinearize after mul: len 3 -> 2, slots squared
    csq = HE.ct_mul(params, c, c)
    assert len(csq) == 3
    cs = HE.keyswitch(params, ek, csq)
    assert len(cs) == 2
    dec = ctx.decode(HE.decrypt(params, kp, cs))
    assert [s[0] for s in dec[:len(vals)]] == [v * v % 256 for v in vals]

    # PolyCRT slot rotation: galois key at the cycle generator
    g, order = ctx.rotation_generator()
    perm = ctx.galois_slot_permutation(g)
    assert sorted(perm) == list(range(ctx.nslots))
    gk = HE.keygen_galois(params, kp, rng, galois_element=g)
    cr = HE.rotate(params, gk, c)
    got = [s[0] for s in ctx.decode(HE.decrypt(params, kp, cr))]
    want = [vals[perm[i]] if perm[i] < len(vals) else 0
            for i in range(ctx.nslots)]
    assert got == want
    # in the cycle ordering, sigma_g is exactly a cyclic shift
    full = list(range(10, 10 + ctx.nslots))
    cf = HE.encrypt(params, kp, ctx.encode(full), rng)
    gotf = [s[0] for s in ctx.decode(HE.decrypt(params, kp,
                                                HE.rotate(params, gk, cf)))]
    view = [gotf[i] for i in order]
    base = [full[i] for i in order]
    assert view == base[1:] + base[:1]
