"""NTT kernel tests: NTT∘INTT = id; NTT-pointwise-mul == naive O(n²)
negacyclic convolution (reference fallback pow2_cyc_rings.jl:150-165);
galois permutation semantics."""

import numpy as np
import jax.numpy as jnp

from toyfhe_tpu.ops import modmath, ntt
from toyfhe_tpu.utils import numtheory as nt


def _tables(n=128, logqs=(29, 28)):
    return ntt.NttTables(n, nt.ntt_prime_chain(n, logqs))


def _rand_poly(rng, primes, n):
    return np.stack([rng.integers(0, p, n, dtype=np.uint32) for p in primes])


def test_roundtrip():
    t = _tables(256)
    rng = np.random.default_rng(0)
    x = _rand_poly(rng, t.primes, t.n)
    y = np.asarray(ntt.intt(t, ntt.ntt(t, jnp.asarray(x))))
    np.testing.assert_array_equal(y, x)


def test_roundtrip_batched():
    t = _tables(64)
    rng = np.random.default_rng(3)
    x = np.stack([_rand_poly(rng, t.primes, t.n) for _ in range(5)])
    y = np.asarray(ntt.intt(t, ntt.ntt(t, jnp.asarray(x))))
    np.testing.assert_array_equal(y, x)


def test_mul_matches_naive():
    t = _tables(64)
    rng = np.random.default_rng(1)
    a = _rand_poly(rng, t.primes, t.n)
    b = _rand_poly(rng, t.primes, t.n)
    da = ntt.ntt(t, jnp.asarray(a))
    db = ntt.ntt(t, jnp.asarray(b))
    prod = np.asarray(ntt.intt(t, modmath.mul_mod(da, db, t.mp)))
    for l, p in enumerate(t.primes):
        np.testing.assert_array_equal(prod[l], ntt.naive_negacyclic_mul(a[l], b[l], p))


def test_slot_semantics():
    # dual[k] must equal evaluation at psi^{2k+1} (SlotEncoding contract,
    # encoding.jl:31-57).
    t = _tables(16, logqs=(29,))
    rng = np.random.default_rng(2)
    a = _rand_poly(rng, t.primes, t.n)
    d = np.asarray(ntt.ntt(t, jnp.asarray(a)))
    p, psi = t.primes[0], t.psis[0]
    for k in range(t.n):
        point = pow(psi, 2 * k + 1, p)
        expect = sum(int(a[0][j]) * pow(point, j, p) for j in range(t.n)) % p
        assert int(d[0][k]) == expect


def test_galois():
    # x(X) -> x(X^g) then compare against polynomial substitution.
    n = 32
    t = _tables(n, logqs=(29,))
    rng = np.random.default_rng(4)
    a = _rand_poly(rng, t.primes, n)
    g = 3
    src, neg = ntt.galois_perm_tables(n, g)
    out = np.asarray(ntt.apply_galois(t.mp, jnp.asarray(a), src, neg))
    p = t.primes[0]
    expect = np.zeros(n, dtype=object)
    for i in range(n):
        q, r = divmod(g * i, n)
        v = int(a[0][i])
        expect[r] = (expect[r] + (-v if q % 2 else v)) % p
    np.testing.assert_array_equal(out[0].astype(object), expect)


def test_galois_composition_with_ntt():
    # galois acts on slots as a permutation: check g=3 rotates slot indices
    # in the Zm* ordering used by SlotEncoding/CKKS.
    n = 16
    t = _tables(n, logqs=(29,))
    rng = np.random.default_rng(5)
    a = _rand_poly(rng, t.primes, n)
    src, neg = ntt.galois_perm_tables(n, 3)
    ga = ntt.apply_galois(t.mp, jnp.asarray(a), src, neg)
    d = np.asarray(ntt.ntt(t, jnp.asarray(a)))[0]
    dg = np.asarray(ntt.ntt(t, ga))[0]
    p, psi = t.primes[0], t.psis[0]
    # slot k of galois(a) = a evaluated at (psi^{2k+1})^3
    for k in range(n):
        e = pow(psi, (2 * k + 1) * 3 % (2 * n), p)
        val = sum(int(np.asarray(a)[0][j]) * pow(e, j, p) for j in range(n)) % p
        assert int(dg[k]) == val
