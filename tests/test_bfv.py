"""BFV scenario tests mirroring the reference suite.

Scenarios: bfv_triv.jl, bfv_simd.jl, bfv_keyswitch.jl, bfv_noise.jl,
bfv_crt.jl (cited per test). Parameters are re-planned onto <2^31 RNS
limb towers (SURVEY §7 hard part 1); assertions check the same
encrypt→evaluate→decrypt properties.
"""

import jax
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.utils import numtheory as nt


@pytest.fixture(scope="module")
def bfv53():
    # test/bfv_triv.jl:5-11 — p=53, eval_mult_count=2, auto params
    return F.bfv_params(53, eval_mult_count=2)


@pytest.fixture(scope="module")
def bfv7():
    # test/bfv_keyswitch.jl:5-8 — p=7, eval_mult_count=3
    return F.bfv_params(7, eval_mult_count=3)


def test_bfv_triv(bfv53):
    """test/bfv_triv.jl:13-22: scalar 6, decrypt, square -> 36."""
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    kp = F.keygen(bfv53, ks[0])
    plain = F.scalar_encode(bfv53.plaintext_space(), 6)
    c = F.encrypt(kp, plain, ks[1])
    assert F.decrypt(kp, c)[0] == 6
    y = F.ct_mul(c, c)
    assert F.decrypt(kp, y)[0] == 0x24


def test_bfv_simd():
    """test/bfv_simd.jl: p=65537 SIMD slots, slotwise products."""
    params = F.bfv_params(65537, eval_mult_count=1)
    pring = params.plaintext_space()
    assert pring.has_slots
    n = pring.n
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    kp = F.keygen(params, ks[0])

    s1 = np.zeros(n, dtype=np.int64)
    s1[0] = 1
    s1[1] = 1
    s2 = np.full(n, 10, dtype=np.int64)
    s2[0] = 5
    c1 = F.encrypt(kp, F.slot_encode(pring, s1), ks[1])
    c2 = F.encrypt(kp, F.slot_encode(pring, s2), ks[2])
    y = F.ct_mul(c1, c2)
    data = F.slot_decode(F.decrypt(kp, y))
    assert data[0] == 5
    assert data[1] == 10
    assert np.all(data[2:] == 0)


def test_bfv_keyswitch(bfv7):
    """test/bfv_keyswitch.jl:10-26: relinearize len-3 -> 2, mul after."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    kp = F.keygen(bfv7, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    plain = F.scalar_encode(bfv7.plaintext_space(), 2)
    c1 = F.encrypt(kp, plain, ks[2])
    assert F.decrypt(kp, c1)[0] == 2
    c1sq = F.ct_mul(c1, c1)
    assert F.decrypt(kp, c1sq)[0] == 4
    cswitch = F.keyswitch(ek, c1sq)
    assert len(cswitch.cs) == 2
    assert F.decrypt(kp, cswitch)[0] == 4
    assert F.decrypt(kp, F.ct_mul(cswitch, c1))[0] == 1


def test_bfv_noise(bfv7):
    """test/bfv_noise.jl: strict noise-budget ordering through 3 muls +
    relins, final budget positive and small-ish."""
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    kp = F.keygen(bfv7, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    c1 = F.encrypt(kp, F.scalar_encode(bfv7.plaintext_space(), 2), ks[2])
    b1 = F.invariant_noise_budget(kp, c1)
    c1sq = F.ct_mul(c1, c1)
    b2 = F.invariant_noise_budget(kp, c1sq)
    assert b2 < b1
    cswitch1 = F.keyswitch(ek, c1sq)
    bswitch1 = F.invariant_noise_budget(kp, cswitch1)
    cswitchmul = F.ct_mul(cswitch1, c1)
    bswitchmul = F.invariant_noise_budget(kp, cswitchmul)
    assert bswitchmul < bswitch1 < b1
    cswitch2 = F.keyswitch(ek, cswitchmul)
    cswitchmul2 = F.ct_mul(F.keyswitch(ek, cswitchmul), c1)
    bswitchmul2 = F.invariant_noise_budget(kp, cswitchmul2)
    assert bswitchmul2 < F.invariant_noise_budget(kp, cswitch2) < bswitch1
    # Reference asserts 1 < b < 10 for its heuristic params
    # (bfv_noise.jl:34) — a param-gen QUALITY check: the tower must not
    # be wildly oversized. The reference measures its window at
    # qPrime ≈ 2^(⌈log2 q⌉+1) (bfv.jl:101-103), so our window shifts by
    # the slack of our RNS tower over THAT modulus, plus a 2-bit
    # allowance for the RNS-limb gadget (ct·s decomposed into ~28-bit
    # limb residues, rlwe_she.jl:327-330) being noisier than the
    # reference test's base-2 window gadget (relin_window=1).
    import math
    slack = (math.log2(bfv7.ring_cipher.modulus)
             - (math.ceil(bfv7.planned_q_bits) + 1))
    assert 1 < bswitchmul2 < 10 + max(0.0, slack) + 2, (bswitchmul2, slack)
    assert F.decrypt(kp, cswitchmul2)[0] == pow(2, 4, 7)


def test_bfv_crt_handbuilt():
    """test/bfv_crt.jl: hand-built 2-limb ciphertext ring + explicit aux
    base from the continued prime walk, p=53."""
    n = 2048
    ring = F.make_rns_ring(n, (30, 29))
    # aux base continues the walk past the ct tower (bfv_crt.jl:18-27)
    last = max(ring.primes)
    aux_primes = []
    for _ in range(4):
        last = nt.next_prime(last + 2 * n, interval=2 * n)
        aux_primes.append(last)
    aux = F.make_ring(n, aux_primes)
    pring = F.PlainRing(n, 53)
    params = F.BFVParams(ring, aux, pring, 1, 3.2,
                         delta=ring.modulus // 53)
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    kp = F.keygen(params, ks[0])
    c = F.encrypt(kp, F.scalar_encode(pring, 6), ks[1])
    assert F.decrypt(kp, c)[0] == 6
    y = F.ct_mul(c, c)
    assert F.decrypt(kp, y)[0] == 0x24


def test_usage_errors(bfv7, bfv53):
    """UsageError guards (rlwe_she.jl:223-225,233-235,248-250)."""
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    kp1 = F.keygen(bfv7, ks[0])
    kp2 = F.keygen(bfv53, ks[1])
    c1 = F.encrypt(kp1, F.scalar_encode(bfv7.plaintext_space(), 1), ks[2])
    c2 = F.encrypt(kp2, F.scalar_encode(bfv53.plaintext_space(), 1), ks[3])
    with pytest.raises(F.UsageError):
        F.ct_add(c1, c2)
    with pytest.raises(F.UsageError):
        F.ct_mul(c1, c2)
