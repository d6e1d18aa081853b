"""CKKS scenario tests mirroring ckks_triv.jl, ckks_modswitch.jl,
ckks_rotate.jl, ckks_matmul.jl, ckks_modraise.jl.

Scale/limb sizes are re-planned for <2^31 limbs: where the reference uses
40-60-bit primes with scale 2^40..2^60, we use 29/30-bit limb towers with
scales sized so the residual precision matches the reference assertions.
"""

from fractions import Fraction

import jax
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import ring as ringops


def test_ckks_triv():
    """ckks_triv.jl: N=2048, LinRange(0,1), encoder-only then encrypted,
    square, atol 1e-4."""
    ring = F.make_rns_ring(2048, (30, 29, 29))
    params = F.CKKSParams(ring, 4, 3.2)
    scale = Fraction(2) ** 40
    vals = np.linspace(0.0, 1.0, 1024)

    # encoder in isolation (ckks_triv.jl:19-25)
    re = F.ckks_encode(ring, vals.astype(complex), scale)
    sq = ringops.mul(ring, re, re)
    got = F.ckks_decode(ring, sq, scale * scale)
    np.testing.assert_allclose(got.real, vals ** 2, atol=1e-4)

    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    kp = F.keygen(params, ks[0])
    c = F.encrypt(kp, F.make_plaintext(ring, vals, scale), ks[1])
    np.testing.assert_allclose(F.decrypt(kp, c).real, vals, atol=1e-4)
    y = F.ct_mul(c, c)
    np.testing.assert_allclose(F.decrypt(kp, y).real, vals ** 2, atol=1e-4)


def test_ckks_modswitch():
    """ckks_modswitch.jl: N=32 3-limb tower, rescale drops limb & scale;
    plain path atol 1e-5, encrypted atol 1e-3."""
    N = 32
    ring = F.make_rns_ring(N, (30, 29, 29))
    scale = Fraction(2) ** 55
    vals = np.full(N // 2, 2.0)

    # plain rescale (ckks_modswitch.jl:20-24)
    re = F.ckks_encode(ring, vals.astype(complex), scale)
    sub, dropped = ringops.rescale(ring, re)
    got = F.ckks_decode(sub, dropped, scale / ring.primes[-1])
    assert abs(got[0].real - 2.0) < 1e-5

    # with encryption noise (ckks_modswitch.jl:27-33)
    params = F.CKKSParams(ring, 4, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    kp = F.keygen(params, ks[0])
    c = F.encrypt(kp, F.make_plaintext(ring, vals, scale), ks[1])
    switched = F.decrypt(kp, F.ct_rescale(c))
    np.testing.assert_allclose(switched.real, vals, atol=1e-3)


def test_ckks_rotate():
    """ckks_rotate.jl: N=16, galois on plain encoding, manual eval key,
    GaloisKey steps API; includes a complex slot value."""
    N = 16
    ring = F.make_rns_ring(N, (30, 29))
    scale = Fraction(2) ** 40
    vals = np.arange(1, N // 2 + 1, dtype=np.complex128)
    vals[0] += 1j

    # galois element 3 on the plain encoding == circshift by -1
    # (ckks_rotate.jl:24-25)
    re = F.ckks_encode(ring, vals, scale)
    rot = ringops.apply_galois(ring, re, 3)
    got = F.ckks_decode(ring, rot, scale)
    np.testing.assert_allclose(got, np.roll(vals, -1), atol=1e-6)

    params = F.CKKSParams(ring, 4, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    kp = F.keygen(params, ks[0])
    c = F.encrypt(kp, F.CKKSPlaintext(ring, vals, scale), ks[1])

    # manual eval key for galois element 3 (ckks_rotate.jl:35-40)
    cp = F.apply_galois_ct(c, 3)
    sg = ringops.apply_galois(ring, kp.priv.secret, 3)
    ek = F.make_eval_key(ks[2], sg, kp.priv)
    rt = F.decrypt(kp, F.keyswitch(ek, cp))
    np.testing.assert_allclose(rt, np.roll(vals, -1), atol=1e-4)

    # GaloisKey steps API (ckks_rotate.jl:43-45)
    gk = F.keygen_galois(ks[3], kp.priv, steps=1)
    got = F.decrypt(kp, F.rotate(gk, c))
    np.testing.assert_allclose(got, np.roll(vals, 1), atol=1e-4)


def _encrypted_matmul(gk, weights, x):
    """Rotation-based diagonal matmul (ckks_matmul.jl:33-41)."""
    d = weights.shape[1]
    nrep = x.ring.n // 2 // d
    result = F.mul_plain_vector(x, np.tile(np.diag(weights), nrep))
    rotated = x
    for k in range(1, d):
        rotated = F.rotate(gk, rotated)
        diag = np.diag(np.roll(weights, k, axis=1))
        result = F.ct_add(result, F.mul_plain_vector(rotated, np.tile(diag, nrep)))
    return result


def test_ckks_matmul():
    """ckks_matmul.jl: 4x4 all-ones matrix times slot vector, atol 1e-5."""
    N = 32
    ring = F.make_rns_ring(N, (30, 29, 29))
    scale = Fraction(2) ** 40
    vals = np.arange(1, N // 2 + 1, dtype=np.float64)
    W = np.ones((4, 4), dtype=np.float64)

    params = F.CKKSParams(ring, 4, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    kp = F.keygen(params, ks[0])
    c = F.encrypt(kp, F.make_plaintext(ring, vals, scale), ks[1])
    gk = F.keygen_galois(ks[2], kp.priv, steps=4)

    out = F.decrypt(kp, _encrypted_matmul(gk, W, c))
    # plaintext mirror of the same diagonal algorithm (infer.jl:48-50);
    # with W = ones this is a genuine column-sum matmul check
    expect = np.zeros(N // 2)
    for k in range(4):
        diag = np.diag(np.roll(W, k, axis=1))
        expect += np.tile(diag, 4) * np.roll(vals, 4 * k)
    np.testing.assert_allclose(out.real, expect, atol=1e-5)


def test_ckks_modraise():
    """ckks_modraise.jl: special-prime identity keyswitch round-trip,
    relin_window=0, atol 1e-8."""
    N = 32
    ring = F.make_rns_ring(N, (30, 29, 29))
    params = F.ModulusRaised(F.CKKSParams(ring, 0, 3.2))
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    kp = F.keygen(params, ks[0])
    scale = Fraction(2) ** 40
    vals = np.arange(1, N // 2 + 1, dtype=np.float64)
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals, scale), ks[1])
    # raw secret: make_eval_key applies the pₛ lift itself, exactly as
    # the reference dispatch does (modulusraising.jl:28-32)
    ek = F.make_eval_key(ks[2], kp.priv.secret, kp.priv)
    got = F.decrypt(kp, F.keyswitch(ek, c))
    np.testing.assert_allclose(got.real, vals, atol=1e-8)


def test_ckks_scale_mismatch_guard():
    ring = F.make_rns_ring(16, (30, 29))
    params = F.CKKSParams(ring, 4, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    kp = F.keygen(params, ks[0])
    v = np.ones(8)
    c1 = F.encrypt(kp, F.make_plaintext(ring, v, Fraction(2) ** 40), ks[1])
    c2 = F.encrypt(kp, F.make_plaintext(ring, v, Fraction(2) ** 41), ks[2])
    with pytest.raises(ValueError):
        F.ct_add(c1, c2)
