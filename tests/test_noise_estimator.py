"""Analytic (key-free) CKKS noise estimator: the predicted high-prob
error bound must dominate the measured error at every pipeline stage,
without being uselessly loose. Beyond the reference, whose only meter
(bfv.jl:136-164) requires the secret key and covers BFV alone."""

from fractions import Fraction

import jax
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import noise as NZ
from toyfhe_tpu.core import ckks_encoding as CE


N = 64
H = N // 2
SCALE = Fraction(2) ** 26
LOOSE = 2 ** 12          # bound may exceed measured by at most this


def _check(est, kp, c, expected):
    got = F.decrypt(kp, c)
    measured = float(np.abs(np.asarray(got) - expected).max())
    assert measured <= est.eps, (measured, est.eps)
    assert est.eps <= max(measured, 1e-12) * LOOSE, (measured, est.eps)
    return measured


def _pipeline(params, seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    gk = F.keygen_galois(ks[2], kp.priv, steps=1)
    rng = np.random.default_rng(11)
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.9
    ring = params.ring_cipher
    c = F.encrypt(kp, F.make_plaintext(ring, vals, SCALE), ks[3])

    # fresh
    est = NZ.est_fresh(c, float(np.abs(vals).max()))
    _check(est, kp, c, vals)

    # ct×ct square → relinearize → rescale
    sq = F.ct_mul(c, c)
    est_sq = NZ.est_mul(est, est)
    sw = F.keyswitch(ek, sq)
    est_sw = NZ.est_keyswitch(est_sq, sw)
    rs = F.ct_rescale(sw)
    est_rs = NZ.est_rescale(est_sw, rs)
    _check(est_rs, kp, rs, vals ** 2)

    # rotate (steps=1 rolls +1, ckks_rotate.jl:43-45 convention)
    rot = F.rotate(gk, rs)
    est_rot = NZ.est_rotate(est_rs, rot)
    _check(est_rot, kp, rot, np.roll(vals ** 2, 1))

    # plain multiply at an explicit scale + rescale
    w = rng.uniform(-1, 1, H)
    p = rot.ring.primes[-1]
    pm = F.ct_rescale(CE.mul_plain_vector_at(rot, w, Fraction(p)))
    est_pm = NZ.est_rescale(
        NZ.est_mul_plain(est_rot, rot, float(np.abs(w).max()), p), pm)
    _check(est_pm, kp, pm, np.roll(vals ** 2, 1) * w)

    # add
    both = F.ct_add(pm, pm)
    est_both = NZ.est_add(est_pm, est_pm)
    m = _check(est_both, kp, both, 2 * np.roll(vals ** 2, 1) * w)
    return est_both, m


def test_estimator_windowed():
    """Windowed-digit gadget (relin_window = 4)."""
    ring = F.make_rns_ring(N, (30, 26, 26, 26))
    params = F.CKKSParams(ring, 4, 3.2)
    est, measured = _pipeline(params, 3)
    assert est.precision_bits > 8


@pytest.mark.slow
def test_estimator_modraised():
    """Special-prime (ModulusRaised) gadget — the production keyswitch."""
    ring = F.make_rns_ring(N, (30, 26, 26, 26, 30))
    params = F.ModulusRaised(F.CKKSParams(ring, 0, 3.2))
    est, measured = _pipeline(params, 5)
    assert est.precision_bits > 8


@pytest.mark.slow
def test_estimator_hybrid():
    """dnum-grouped hybrid gadget."""
    ring = F.make_rns_ring(N, (30, 26, 26, 26, 26, 26, 30, 30))
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), 3, 2)
    est, measured = _pipeline(params, 9)
    assert est.precision_bits > 8


def test_estimator_sparse_secret():
    """Sparse ternary secret changes ‖s‖₂² in every term."""
    ring = F.make_rns_ring(N, (30, 26, 26, 26))
    params = F.CKKSParams(ring, 4, 3.2, secret="sparse", hamming_weight=16)
    _pipeline(params, 7)
