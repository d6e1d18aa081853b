"""Unit tests for the uint32 Montgomery scalar layer vs Python bigints.

Kernel-level coverage the reference lacks (SURVEY §4 implication)."""

import numpy as np
import jax.numpy as jnp

from toyfhe_tpu.ops import modmath
from toyfhe_tpu.utils import numtheory as nt

PRIMES = [(1 << 30) + 3 * (1 << 13) + 1]  # placeholder replaced below


def _tower(n=4096, logqs=(30, 29, 28)):
    return nt.ntt_prime_chain(n, logqs)


def test_prime_chain():
    n = 4096
    ps = _tower(n)
    assert len(set(ps)) == 3
    for p in ps:
        assert nt.is_prime(p)
        assert (p - 1) % (2 * n) == 0
        assert p < (1 << 31)


def test_mul32_matches_bigint():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, size=1000, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, size=1000, dtype=np.uint32)
    hi, lo = modmath.mul32(jnp.asarray(a), jnp.asarray(b))
    full = a.astype(object) * b.astype(object)
    np.testing.assert_array_equal(np.asarray(hi).astype(object) * (1 << 32) + np.asarray(lo), full)


def test_mont_roundtrip_and_mul():
    ps = _tower()
    mp = modmath.MontParams.make(ps)
    rng = np.random.default_rng(1)
    a = np.stack([rng.integers(0, p, 256, dtype=np.uint32) for p in ps])
    b = np.stack([rng.integers(0, p, 256, dtype=np.uint32) for p in ps])
    am = modmath.to_mont(jnp.asarray(a), mp)
    back = modmath.from_mont(am, mp)
    np.testing.assert_array_equal(np.asarray(back), a)

    prod = np.asarray(modmath.mul_mod(jnp.asarray(a), jnp.asarray(b), mp))
    for l, p in enumerate(ps):
        expect = (a[l].astype(object) * b[l].astype(object)) % p
        np.testing.assert_array_equal(prod[l].astype(object), expect)


def test_add_sub_neg_centered():
    ps = _tower()
    mp = modmath.MontParams.make(ps)
    rng = np.random.default_rng(2)
    a = np.stack([rng.integers(0, p, 128, dtype=np.uint32) for p in ps])
    b = np.stack([rng.integers(0, p, 128, dtype=np.uint32) for p in ps])
    s = np.asarray(modmath.add_mod(jnp.asarray(a), jnp.asarray(b), mp))
    d = np.asarray(modmath.sub_mod(jnp.asarray(a), jnp.asarray(b), mp))
    n = np.asarray(modmath.neg_mod(jnp.asarray(a), mp))
    c = np.asarray(modmath.centered(jnp.asarray(a), mp))
    for l, p in enumerate(ps):
        np.testing.assert_array_equal(s[l], (a[l].astype(object) + b[l]) % p)
        np.testing.assert_array_equal(d[l], (a[l].astype(object) - b[l]) % p)
        np.testing.assert_array_equal(n[l], (-a[l].astype(object)) % p)
        expect_c = np.array([nt.centered(int(x), p) for x in a[l]])
        np.testing.assert_array_equal(c[l], expect_c)


def test_from_signed():
    ps = _tower()
    mp = modmath.MontParams.make(ps)
    x = np.array([-5, -1, 0, 1, 7, -(1 << 20)], dtype=np.int32)
    r = np.asarray(modmath.from_signed(jnp.asarray(np.tile(x, (len(ps), 1))), mp))
    for l, p in enumerate(ps):
        np.testing.assert_array_equal(r[l], [v % p for v in x.tolist()])


def test_frac_to_float_borderline_huge_ratio():
    """Gaps of 1021..1024 bits can still be finite doubles; only a
    genuine overflow maps to inf (ADVICE r1: previous early-out at 1020
    rounded representable scales to inf)."""
    from fractions import Fraction

    from toyfhe_tpu.utils.numtheory import frac_to_float

    f = Fraction(2) ** 1022          # representable: 2^1022 < DBL_MAX
    assert frac_to_float(f) == float(2.0 ** 1022)
    assert frac_to_float(-f) == -float(2.0 ** 1022)
    big = Fraction(2) ** 1022 * 3    # ~2^1023.58, still finite
    assert frac_to_float(big) == float(big.numerator >> 960) * 2.0 ** 960
    import math
    assert frac_to_float(Fraction(2) ** 1025) == math.inf
    assert frac_to_float(-(Fraction(2) ** 1025)) == -math.inf
    # huge numerator AND denominator, moderate ratio
    g = (Fraction(2) ** 5000) / (Fraction(2) ** 5000 - Fraction(12345))
    assert abs(frac_to_float(g) - 1.0) < 1e-12
