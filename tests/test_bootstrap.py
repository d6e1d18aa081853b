"""Bootstrapping groundwork: BSGS linear transforms, conjugation,
CoeffToSlot/SlotToCoeff round-trip, homomorphic polynomial evaluation.
All beyond the reference's scope (ToyFHE has no bootstrap)."""

from fractions import Fraction

import jax
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import bootstrap as B
from toyfhe_tpu.core import ring as ringops
from toyfhe_tpu.utils import numtheory as nt


N = 32
H = N // 2


@pytest.fixture(scope="module")
def setup():
    ring = F.make_rns_ring(N, (30, 26, 26, 26, 26, 26))
    params = F.CKKSParams(ring, 4, 3.2)   # windowed digits: keyswitch noise stays tiny without the special prime
    ks = jax.random.split(jax.random.PRNGKey(21), 4)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    bs, gs = B.bsgs_split(H)
    gks, gk_conj = B.keygen_bootstrap_keys(ks[2], kp.priv, bs, gs)
    rng = np.random.default_rng(7)
    vals = rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)
    scale = Fraction(2) ** 26
    c = F.encrypt(kp, F.make_plaintext(ring, vals, scale), ks[3])
    return ring, params, kp, ek, gks, gk_conj, c, vals, scale


def test_conjugate(setup):
    ring, params, kp, ek, gks, gk_conj, c, vals, scale = setup
    got = F.decrypt(kp, B.conjugate(gk_conj, c))
    np.testing.assert_allclose(got, np.conj(vals), atol=1e-3)


def test_rotate_steps(setup):
    ring, params, kp, ek, gks, gk_conj, c, vals, scale = setup
    for k in (1, 3, 12):      # steps covered by the BSGS key set
        got = F.decrypt(kp, B.rotate_steps(gks, c, k))
        np.testing.assert_allclose(got, np.roll(vals, -k), atol=1e-3)


def test_linear_transform(setup):
    ring, params, kp, ek, gks, gk_conj, c, vals, scale = setup
    rng = np.random.default_rng(11)
    M = rng.uniform(-1, 1, (H, H)) + 1j * rng.uniform(-1, 1, (H, H))
    out = F.ct_rescale(B.linear_transform(gks, c, M))
    got = F.decrypt(kp, out)
    np.testing.assert_allclose(got, M @ vals, atol=2e-3)


def test_coeff_to_slot(setup):
    """C2S puts the (scale-normalized, centered) plaintext COEFFICIENTS
    into the slots of two ciphertexts."""
    ring, params, kp, ek, gks, gk_conj, c, vals, scale = setup
    pt = F.ckks_encode(ring, vals, scale)
    coeffs = np.array([float(nt.centered(x, ring.modulus)) / float(scale)
                       for x in ring.to_bigint(np.asarray(pt.primal))])
    lo, hi = B.coeff_to_slot(gks, gk_conj, c)
    got_lo = F.decrypt(kp, F.ct_rescale(lo))
    got_hi = F.decrypt(kp, F.ct_rescale(hi))
    np.testing.assert_allclose(got_lo.real, coeffs[:H], atol=2e-3)
    np.testing.assert_allclose(got_hi.real, coeffs[H:], atol=2e-3)
    assert np.abs(got_lo.imag).max() < 2e-3
    assert np.abs(got_hi.imag).max() < 2e-3


def test_c2s_s2c_roundtrip(setup):
    """SlotToCoeff(CoeffToSlot(ct)) recovers the original slot vector —
    the two linear phases of bootstrap compose to the identity."""
    ring, params, kp, ek, gks, gk_conj, c, vals, scale = setup
    lo, hi = B.coeff_to_slot(gks, gk_conj, c)
    lo, hi = F.ct_rescale(lo), F.ct_rescale(hi)
    back = F.ct_rescale(B.slot_to_coeff(gks, lo, hi))
    got = F.decrypt(kp, back)
    np.testing.assert_allclose(got, vals, atol=5e-3)


def test_eval_poly(setup):
    """Homomorphic Horner: degree-5 odd sine approximation on [-1, 1]."""
    ring, params, kp, ek, gks, gk_conj, c, vals, scale = setup
    rng = np.random.default_rng(3)
    xs = rng.uniform(-1, 1, H)
    ks = jax.random.split(jax.random.PRNGKey(9), 1)[0]
    cx = F.encrypt(kp, F.make_plaintext(ring, xs, scale), ks)
    # sin(x) ≈ x − x³/6 + x⁵/120
    coeffs = [0.0, 1.0, 0.0, -1 / 6, 0.0, 1 / 120]
    out = B.eval_poly(ek, cx, coeffs)
    got = F.decrypt(kp, out).real
    expect = xs - xs ** 3 / 6 + xs ** 5 / 120
    np.testing.assert_allclose(got, expect, atol=2e-3)
    np.testing.assert_allclose(got, np.sin(xs), atol=2e-3)
