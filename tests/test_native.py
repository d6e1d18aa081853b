"""Native C++ host runtime vs exact Python oracles."""

import numpy as np
import pytest

from toyfhe_tpu import native
from toyfhe_tpu.utils import numtheory as nt


@pytest.fixture(scope="module")
def ctx():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    primes = nt.ntt_prime_chain(64, (30, 29, 28, 28))
    return native.CrtNative(primes), primes


def _residues(rng, primes, n):
    return np.stack([rng.integers(0, p, n, dtype=np.uint64) for p in primes])


def test_centered_mod(ctx):
    nat, primes = ctx
    rng = np.random.default_rng(0)
    res = _residues(rng, primes, 128)
    p = 65537
    got = nat.decode_centered_mod(res, p)
    q = int(np.prod([int(x) for x in primes], dtype=object))
    for j in range(res.shape[1]):
        x = nt.crt_reconstruct([int(r[j]) for r in res], primes)
        assert got[j] == nt.centered(x, q) % p


def test_bfv_decode(ctx):
    nat, primes = ctx
    rng = np.random.default_rng(1)
    res = _residues(rng, primes, 128)
    q = int(np.prod([int(x) for x in primes], dtype=object))
    p = 53
    delta = q // p
    got = nat.decode_bfv(res, delta, p)
    for j in range(res.shape[1]):
        x = nt.crt_reconstruct([int(r[j]) for r in res], primes)
        expect = nt.divround(nt.centered(x, q), delta) % p
        assert got[j] == expect, (j, got[j], expect)


def test_centered_double(ctx):
    nat, primes = ctx
    rng = np.random.default_rng(2)
    res = _residues(rng, primes, 64)
    q = int(np.prod([int(x) for x in primes], dtype=object))
    got = nat.decode_centered_double(res)
    for j in range(res.shape[1]):
        x = nt.centered(nt.crt_reconstruct([int(r[j]) for r in res], primes), q)
        assert got[j] == pytest.approx(float(x), rel=1e-14)


def test_noise_worst(ctx):
    nat, primes = ctx
    rng = np.random.default_rng(3)
    res = _residues(rng, primes, 64)
    q = int(np.prod([int(x) for x in primes], dtype=object))
    delta = q // 53
    got = nat.noise_worst(res, delta)
    worst = 1
    for j in range(res.shape[1]):
        x = nt.crt_reconstruct([int(r[j]) for r in res], primes)
        r = x % delta
        worst = max(worst, delta - r if r > delta // 2 else r)
    assert got == pytest.approx(float(worst), rel=1e-12)
