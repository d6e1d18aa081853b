"""The eager public API composes under jax.jit (serving-speed front-end).

Ciphertexts and keys are pytrees (core/rlwe.py registration): whole
pipelines written against the reference-shaped API compile to one XLA
program and match the eager results bit-exactly.
"""

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import ring as ringops


@pytest.fixture(scope="module")
def setup():
    N = 64
    ring = F.make_rns_ring(N, (30, 29, 29))
    params = F.CKKSParams(ring, 0, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    gk = F.keygen_galois(ks[2], kp.priv, steps=1)
    vals = np.linspace(0.1, 1.0, N // 2)
    scale = Fraction(2) ** 40
    c = F.encrypt(kp, F.make_plaintext(ring, vals, scale), ks[3])
    return ring, params, kp, ek, gk, c, vals, scale


def _duals(ring, c):
    return [np.asarray(ringops.ensure_dual(ring, x).dual) for x in c.cs]


def test_jit_square_relin_rescale(setup):
    ring, params, kp, ek, gk, c, vals, scale = setup

    def pipeline(ek, c):
        return F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))

    eager = pipeline(ek, c)
    jitted = jax.jit(pipeline)(ek, c)
    assert jitted.enc == eager.enc and jitted.ring is eager.ring
    for a, b in zip(_duals(eager.ring, eager), _duals(jitted.ring, jitted)):
        np.testing.assert_array_equal(a, b)
    got = F.decrypt(kp, jitted).real
    np.testing.assert_allclose(got, vals ** 2, atol=2e-4)


def test_jit_rotate(setup):
    ring, params, kp, ek, gk, c, vals, scale = setup
    eager = F.rotate(gk, c)
    jitted = jax.jit(F.rotate)(gk, c)
    for a, b in zip(_duals(eager.ring, eager), _duals(jitted.ring, jitted)):
        np.testing.assert_array_equal(a, b)


def test_jit_encrypt(setup):
    """encrypt jits over (pub, rng) with the host-encoded plaintext
    closed over; equal rng keys give bit-identical ciphertexts."""
    ring, params, kp, ek, gk, c, vals, scale = setup
    pt = F.make_plaintext(ring, vals, scale)
    k = jax.random.PRNGKey(5)
    eager = F.encrypt(kp.pub, pt, k)
    jitted = jax.jit(lambda pub, k: F.encrypt(pub, pt, k))(kp.pub, k)
    for a, b in zip(_duals(eager.ring, eager), _duals(jitted.ring, jitted)):
        np.testing.assert_array_equal(a, b)
