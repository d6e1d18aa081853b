"""dnum-grouped hybrid key-switching (core/hybrid.py): the production
gadget with limb-group digits fast-base-converted into a multi-special-
prime tower. Beyond the reference, whose decompositions are per-limb or
per-bit-window (rlwe_she.jl:327-338)."""

from fractions import Fraction

import jax
import numpy as np
import pytest

import toyfhe_tpu as F


N = 32
H = N // 2
SCALE = Fraction(2) ** 26


def _setup(dnum, num_special, nq=8, seed=2):
    # nq ct primes + num_special 30-bit raising primes
    ring = F.make_rns_ring(N, (28,) * nq + (30,) * num_special)
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), dnum, num_special)
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    gk = F.keygen_galois(ks[2], kp.priv, steps=1)
    rng = np.random.default_rng(7)
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.8
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals, SCALE),
                  ks[3])
    return params, kp, ek, gk, c, vals


@pytest.mark.parametrize("dnum,k", [
    pytest.param(4, 2, marks=pytest.mark.slow),
    (2, 4),
    pytest.param(8, 1, marks=pytest.mark.slow),
])
def test_square_relin(dnum, k):
    """x² with hybrid relinearization at several (dnum, num_special)
    shapes — including the per-limb degenerate case dnum=L, k=1."""
    params, kp, ek, gk, c, vals = _setup(dnum, k)
    out = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
    got = F.decrypt(kp, out)
    np.testing.assert_allclose(got, vals ** 2, atol=2e-4)


def test_rotation():
    params, kp, ek, gk, c, vals = _setup(4, 2)
    got = F.decrypt(kp, F.rotate(gk, c))
    np.testing.assert_allclose(got, np.roll(vals, 1), atol=2e-4)


def test_after_drops_cross_group():
    """Key-switch keeps working after modswitch drops shrink the tower
    BELOW a group boundary (the keys' ĝ_j factors are level-independent;
    only the digit count shrinks)."""
    params, kp, ek, gk, c, vals = _setup(4, 2, nq=8)
    # drop 8 → 3 limbs: groups of α=2 become [q0q1, q2] — 2 digits
    while c.ring.nlimbs > 3:
        c = F.ct_modswitch_drop(c)
    out = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
    got = F.decrypt(kp, out)
    np.testing.assert_allclose(got, vals ** 2, atol=2e-4)
    rot = F.decrypt(kp, F.rotate(gk, c))
    np.testing.assert_allclose(rot, np.roll(vals, 1), atol=2e-4)


def test_digit_count():
    """The whole point: dnum digits (→ dnum NTT batches), not L."""
    from toyfhe_tpu.core import ring as R
    params, kp, ek, gk, c, vals = _setup(4, 2)
    exp_ring, digits = params.hybrid_decompose(c.ring, c.cs[1])
    assert digits.shape[0] == 4                    # dnum, not L=8
    assert exp_ring.nlimbs == c.ring.nlimbs + 2    # Q_t ∪ P


@pytest.mark.slow
def test_chained_muls():
    """Three chained squarings with rescales — noise stays controlled
    through repeated hybrid key-switches. Scale-sized (26-bit) level
    primes keep the scale in equilibrium so precision doesn't erode."""
    ring = F.make_rns_ring(N, (30,) + (26,) * 7 + (30,) * 2)
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), 4, 2)
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    rng = np.random.default_rng(7)
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.8
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals, SCALE),
                  ks[3])
    x, expect = c, vals
    for _ in range(3):
        x = F.ct_rescale(F.keyswitch(ek, F.ct_mul(x, x)))
        expect = expect ** 2
    got = F.decrypt(kp, x)
    np.testing.assert_allclose(got, expect, atol=2e-3)


def test_matches_modraised_semantics():
    """Hybrid (dnum=L, k=1) and ModulusRaised decrypt to the same values
    on the same workload (different noise, same message)."""
    ring = F.make_rns_ring(N, (28,) * 4 + (30,))
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    rng = np.random.default_rng(3)
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.8
    outs = []
    for wrap in (lambda p: F.HybridRaised(p, 4, 1),
                 lambda p: F.ModulusRaised(p)):
        params = wrap(F.CKKSParams(ring, 0, 3.2))
        kp = F.keygen(params, ks[0])
        ek = F.keygen_eval_mult(ks[1], kp.priv)
        c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals, SCALE),
                      ks[2])
        out = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
        outs.append(F.decrypt(kp, out))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)
    np.testing.assert_allclose(outs[0], vals ** 2, atol=2e-4)


def test_hoisted_rotations():
    """rotate_many shares one decomposition across rotations. The result
    is NOT bit-identical to per-step rotate() — the uncorrected FBC lift
    of σ(x) differs from σ(lift(x)) by small multiples of Q_j, which the
    P-division absorbs — but decrypts to the same message at the same
    noise class."""
    from toyfhe_tpu.core.rlwe import galois_element_for_steps

    params, kp, ek, gk, c, vals = _setup(4, 2)
    n = c.ring.n
    steps = [1, 2, 3]
    gks = F.keygen_galois_set(jax.random.PRNGKey(11), kp.priv, steps)
    els = [galois_element_for_steps(n, s) for s in steps]
    hoisted = F.rotate_many(gks, c, els)
    for s, g in zip(steps, els):
        ref = F.decrypt(kp, F.rotate(gks.for_element(g), c))
        got = F.decrypt(kp, hoisted[g])
        np.testing.assert_allclose(got, np.roll(vals, s), atol=2e-4)
        np.testing.assert_allclose(got, ref, atol=2e-4)


def test_rotate_sum_lazy_moddown():
    """rotate_sum computes Σ_g rot_g(term_g) with ONE divide-by-P
    contraction for the whole batch (the BSGS giant-step schedule).
    Must agree with the rotate-then-add reference schedule to within
    contraction rounding, and with the plaintext sum."""
    from toyfhe_tpu.core.rlwe import galois_element_for_steps

    params, kp, ek, gk, c, vals = _setup(4, 2)
    n = c.ring.n
    steps = [1, 3, 5]
    gks = F.keygen_galois_set(jax.random.PRNGKey(21), kp.priv, steps)
    terms = [(None, c)]                       # identity term, no keyswitch
    expect = np.array(vals)
    for s in steps:
        terms.append((galois_element_for_steps(n, s), c))
        expect = expect + np.roll(vals, s)
    lazy = F.rotate_sum(gks, terms)
    eager = c
    for s, (g, _) in zip(steps, terms[1:]):
        eager = F.ct_add(eager, F.rotate(gks.for_element(g), c))
    got = F.decrypt(kp, lazy)
    np.testing.assert_allclose(got, expect, atol=1e-3)
    np.testing.assert_allclose(got, F.decrypt(kp, eager), atol=1e-3)


@pytest.mark.parametrize("label", ["modraise", "plain-rns"])
def test_hoisting_other_gadgets(label):
    """rotate_many/rotate_sum fast paths also cover the ModulusRaised
    and plain centered-RNS gadgets (any window=0 decomposition commutes
    with the signed galois permutation; raw 2^w windows do not). For the
    identity-contract plain gadget the lazy path is bit-identical to
    rotate()+add; for ModulusRaised it matches to contraction rounding.
    The plain window-0 gadget's keyswitch noise drowns the message
    (that's what ModulusRaised is FOR) — so plain-rns checks only
    hoisted-vs-eager agreement, not decoded values."""
    from toyfhe_tpu.core.rlwe import galois_element_for_steps

    ring = F.make_rns_ring(N, (28,) * 6 + (30,))
    params = (F.ModulusRaised(F.CKKSParams(ring, 0, 3.2))
              if label == "modraise" else F.CKKSParams(ring, 0, 3.2))
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    kp = F.keygen(params, ks[0])
    rng = np.random.default_rng(7)
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.8
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 26), ks[3])
    steps = [1, 2, 5]
    gks = F.keygen_galois_set(jax.random.PRNGKey(11), kp.priv, steps)
    els = [galois_element_for_steps(c.ring.n, s) for s in steps]
    exact = label == "plain-rns"
    refs = {g: F.decrypt(kp, F.rotate(gks.for_element(g), c)) for g in els}
    ref_sum = c
    for g in els:
        ref_sum = F.ct_add(ref_sum, F.rotate(gks.for_element(g), c))
    ref_sum = F.decrypt(kp, ref_sum)

    # pin the fast path: if _HoistGadget.supports regresses and these
    # fall back to rotate(), the test must FAIL, not silently compare
    # the fallback against itself
    from toyfhe_tpu.core import rlwe as _rlwe

    def _no_fallback(*a, **k):
        raise AssertionError("hoisted path fell back to rotate()")

    orig = _rlwe.rotate
    _rlwe.rotate = _no_fallback
    try:
        hoisted = F.rotate_many(gks, c, els)
        lazy = F.rotate_sum(gks, [(None, c)] + [(g, c) for g in els])
    finally:
        _rlwe.rotate = orig
    for s, g in zip(steps, els):
        got = F.decrypt(kp, hoisted[g])
        np.testing.assert_allclose(got, refs[g],
                                   atol=1e-9 if exact else 2e-4)
        if not exact:
            np.testing.assert_allclose(got, np.roll(vals, s), atol=2e-4)
    got = F.decrypt(kp, lazy)
    if exact:
        np.testing.assert_allclose(got, ref_sum, atol=1e-9)
    else:
        expect = vals + sum(np.roll(vals, s) for s in steps)
        np.testing.assert_allclose(got, expect, atol=1e-3)


def test_hoisted_conjugation():
    """The conjugation element 2N−1 also rides the hoisted path."""
    params, kp, ek, gk, c, vals = _setup(4, 2)
    n = c.ring.n
    g = 2 * n - 1
    gkc = F.keygen_galois(jax.random.PRNGKey(12), kp.priv, galois_element=g)
    hoisted = F.rotate_many(F.GaloisKeys([gkc]), c, [g])
    np.testing.assert_allclose(F.decrypt(kp, hoisted[g]), np.conj(vals),
                               atol=2e-4)


def test_rotate_sum_scale_mismatch_guard():
    """The fast path must reject mixed-scale terms just like the
    fallback's ct_add would (ADVICE r1: it used to silently tag with the
    first term's enc)."""
    from toyfhe_tpu.core.ckks_encoding import retag
    from toyfhe_tpu.core.rlwe import galois_element_for_steps

    params, kp, ek, gk, c, vals = _setup(4, 2)
    n = c.ring.n
    gks = F.keygen_galois_set(jax.random.PRNGKey(22), kp.priv, [1])
    g = galois_element_for_steps(n, 1)
    c2 = retag(c, c.enc.scale * 2)
    with pytest.raises(ValueError):
        F.rotate_sum(gks, [(None, c), (g, c2)])
    with pytest.raises(ValueError):
        F.rotate_sum(gks, [(g, c), (g, c2)])
