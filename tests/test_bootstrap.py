"""Bootstrapping groundwork: BSGS linear transforms, conjugation,
CoeffToSlot/SlotToCoeff round-trip, homomorphic polynomial evaluation.
All beyond the reference's scope (ToyFHE has no bootstrap)."""

from fractions import Fraction

import jax
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import bootstrap as B
from toyfhe_tpu.core import rlwe
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


@pytest.fixture(scope="module")
def deep():
    """Bootstrap-grade parameters: deep all-30-bit tower (q₀-sized level
    primes keep the scale in equilibrium through EvalMod) and a sparse
    ternary secret bounding the ModRaise overflow."""
    ring = F.make_rns_ring(N, (30,) * 17)
    params = F.CKKSParams(ring, 4, 3.2, secret="sparse", hamming_weight=4)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    kp = F.keygen(params, ks[0])
    ctx = B.setup_bootstrap(ks[1], kp.priv, K=5.0, deg=46)
    return ring, params, kp, ctx, ks[2]


def test_sparse_ternary_secret(deep):
    ring, params, kp, ctx, k = deep
    prim = np.asarray(
        ringops.ensure_primal(ring, kp.priv.secret).primal)
    vals = np.array([nt.centered(x, ring.modulus)
                     for x in ring.to_bigint(prim)])
    assert np.count_nonzero(vals) == 4
    assert set(np.unique(vals)) <= {-1, 0, 1}


def test_scale_alignment_primitives(setup):
    """mul_plain_scalar_at / ct_to: exact-Fraction scale algebra for
    cross-path adds — the PS evaluator's foundation."""
    from toyfhe_tpu.core import ckks_encoding as CE
    ring, params, kp, ek, gks, gk_conj, c, vals, scale = setup
    # explicit-scale multiply: value ×0.5, tag ×2^20
    c2 = F.ct_rescale(CE.mul_plain_scalar_at(c, 0.5, Fraction(2) ** 20))
    np.testing.assert_allclose(F.decrypt(kp, c2), 0.5 * vals, atol=1e-3)
    # align to (4 limbs, scale 3/2·current) exactly
    target = Fraction(c2.enc.scale) * 3 / 2
    c3 = CE.ct_to(c2, 4, target)
    assert c3.ring.nlimbs == 4 and Fraction(c3.enc.scale) == target
    np.testing.assert_allclose(F.decrypt(kp, c3), 0.5 * vals, atol=1e-3)
    # retag is free exact division of the value
    c4 = CE.retag(c3, Fraction(c3.enc.scale) * 2)
    np.testing.assert_allclose(F.decrypt(kp, c4), 0.25 * vals, atol=1e-3)


@pytest.mark.slow
def test_eval_chebyshev(deep):
    """Paterson–Stockmeyer in the Chebyshev basis: O(√d) muls, O(log d)
    depth, exact per-term scale matching."""
    ring, params, kp, ctx, k = deep
    H = ring.n // 2
    rng = np.random.default_rng(11)
    xs = rng.uniform(-4.5, 4.5, H)
    c = F.encrypt(kp, F.make_plaintext(ring, xs + 0j, Fraction(2) ** 30), k)
    out = B.eval_chebyshev(ctx.ek, c, ctx.cheb, ctx.K)
    got = F.decrypt(kp, out).real
    expect = np.polynomial.chebyshev.chebval(xs / ctx.K, ctx.cheb)
    np.testing.assert_allclose(got, expect, atol=1e-4)
    # the whole point of BSGS/PS: logarithmic depth, not 46 levels
    assert out.ring.nlimbs >= 9


@pytest.mark.slow
def test_full_bootstrap(deep):
    """End-to-end CKKS bootstrap: an exhausted (single-limb) ciphertext
    is refreshed to a deep tower without the secret key, preserving the
    message. ModRaise → retag(q₀) → CoeffToSlot → batched sine EvalMod
    → SlotToCoeff."""
    ring, params, kp, ctx, k = deep
    H = ring.n // 2
    rng = np.random.default_rng(3)
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.7
    c = F.encrypt(kp, F.make_plaintext(ring, vals, Fraction(2) ** 23), k)
    while c.ring.nlimbs > 1:
        c = F.ct_modswitch_drop(c)
    assert c.ring.nlimbs == 1
    out = B.bootstrap(ctx, c)
    assert out.ring.nlimbs >= 5          # usable depth regained
    got = F.decrypt(kp, out)
    np.testing.assert_allclose(got, vals, atol=3e-2)


@pytest.mark.slow
def test_hybrid_bootstrap():
    """Full bootstrap on the production dnum-grouped hybrid gadget
    (core/hybrid.py): 20-limb ct tower, digits are 5 groups of 4 limbs
    — 5 digit NTT batches per keyswitch instead of 20, keys 4× smaller.
    Same factored transforms + arcsine EvalMod as the ModulusRaised
    config."""
    ring = F.make_rns_ring(N, (30,) * 25)      # 20 ct limbs + 5 specials
    params = F.HybridRaised(
        F.CKKSParams(ring, 0, 3.2, secret="sparse", hamming_weight=4),
        dnum=5, num_special=5)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    kp = F.keygen(params, ks[0])
    ctx = B.setup_bootstrap(ks[1], kp.priv, K=5.0, deg=24, radix=16,
                            arcsin=True, double_angle=2)
    rng = np.random.default_rng(3)
    H = N // 2
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.7
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 27), ks[2])
    while c.ring.nlimbs > 1:
        c = F.ct_modswitch_drop(c)
    out = B.bootstrap(ctx, c)
    assert out.ring.nlimbs >= 6
    np.testing.assert_allclose(F.decrypt(kp, out), vals, atol=5e-4)


def test_sfft_factorization():
    """Host-side special-FFT factorization of the decode matrix is exact
    (stages, radix merging, C2S/S2C chains, halfshift link)."""
    from toyfhe_tpu.core import sfft

    for n in (16, 64):
        d = n // 2
        U = B.decode_matrix(n)
        V, W = U[:, :d], U[:, d:]
        M = np.eye(d, dtype=complex)
        for s in sfft.sfft_stages(d):
            M = sfft.dense_from_diags(s, d) @ M
        perm = sfft.bitrev_perm(d)
        np.testing.assert_allclose(M, V[:, perm], atol=1e-12)
        np.testing.assert_allclose(
            np.diag(sfft.halfshift_diag(n)) @ V, W, atol=1e-12)
        plan = sfft.SfftPlan(n, radix=4)
        rng = np.random.default_rng(0)
        v = rng.normal(size=d) + 1j * rng.normal(size=d)

        def ap(chain, x):
            for lvl in chain:
                x = sfft.dense_from_diags(lvl, d) @ x
            return x

        lo_ref = (np.conj(V).T @ v + V.T @ np.conj(v)) / n
        lo_got = ap(plan.c2s_chains[0], v) + ap(plan.c2s_chains[1], np.conj(v))
        np.testing.assert_allclose(lo_got, lo_ref[perm], atol=1e-12)
        lo2, hi2 = rng.normal(size=d), rng.normal(size=d)
        out_got = (ap(plan.s2c_chains[0], lo2[perm])
                   + ap(plan.s2c_chains[1], hi2[perm]))
        np.testing.assert_allclose(out_got, V @ lo2 + W @ hi2, atol=1e-12)


def test_ring_canonicalization():
    """Derived towers with the same limb subset of the same root are the
    SAME RingContext — a special-prime-expanded tower's drop_last is the
    original ciphertext tower (identity equality is what jit static args
    and ct_stack compare)."""
    ring = F.make_rns_ring(16, (20, 20, 20, 20))
    sub = ring.drop_last()
    exp = sub.select([0, 1, 2])
    assert exp.select([0, 1]) is ring.select([0, 1])
    assert ring.select([0, 1, 2]) is sub
    assert sub.select([0, 1, 2]) is sub


@pytest.fixture(scope="module")
def deep_mr():
    """Production-shape bootstrap config: special-prime (ModulusRaised)
    keyswitching — ~45× less keyswitch noise than windowed digits — with
    the factored (special-FFT) linear phases and arcsine-corrected
    EvalMod."""
    ring = F.make_rns_ring(N, (30,) * 21)
    params = F.ModulusRaised(
        F.CKKSParams(ring, 0, 3.2, secret="sparse", hamming_weight=4))
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    kp = F.keygen(params, ks[0])
    ctx = B.setup_bootstrap(ks[1], kp.priv, K=5.0, deg=46, radix=16,
                            arcsin=True)
    return params, kp, ctx, ks[2]


@pytest.mark.slow
def test_factored_bootstrap(deep_mr):
    """Factored C2S/S2C + ModulusRaised + arcsine: ~1e-4 refresh error
    with only O(√radix·log d) rotation keys."""
    params, kp, ctx, k = deep_mr
    assert len(ctx.gks.keys) <= 8          # vs 7 dense at d=16; scales as log at big N
    rng = np.random.default_rng(3)
    H = N // 2
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.7
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 27), k)
    while c.ring.nlimbs > 1:
        c = F.ct_modswitch_drop(c)
    out = B.bootstrap(ctx, c)
    assert out.ring.nlimbs >= 6
    np.testing.assert_allclose(F.decrypt(kp, out), vals, atol=5e-4)


@pytest.mark.slow
def test_double_angle_bootstrap(deep_mr):
    """Double-angle EvalMod: degree-24 cosine seed + 2 squarings replaces
    the degree-46 sine (host composition error 4.5e-10 vs 7.1e-6), so
    the refresh error is dominated by encryption noise, not the fit."""
    params, kp, ctx0, k = deep_mr
    ctx = B.BootstrapContext(ek=ctx0.ek, gks=ctx0.gks, gk_conj=ctx0.gk_conj,
                             K=5.0, deg=24, plan=ctx0.plan, arcsin=True,
                             double_angle=2)
    rng = np.random.default_rng(3)
    H = N // 2
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.7
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 27), k)
    while c.ring.nlimbs > 1:
        c = F.ct_modswitch_drop(c)
    out = B.bootstrap(ctx, c)
    assert out.ring.nlimbs >= 6
    np.testing.assert_allclose(F.decrypt(kp, out), vals, atol=5e-4)


@pytest.mark.slow
def test_jit_bootstrap(deep_mr):
    """The ENTIRE refresh — ModRaise, CoeffToSlot, EvalMod, SlotToCoeff
    — compiles into ONE XLA program: BootstrapContext and CipherText are
    pytrees, rings/plans/scales are static aux. jit output must match
    the eager path bit-for-bit (same ops, same order)."""
    params, kp, ctx0, k = deep_mr
    ctx = B.BootstrapContext(ek=ctx0.ek, gks=ctx0.gks, gk_conj=ctx0.gk_conj,
                             K=5.0, deg=24, plan=ctx0.plan, arcsin=True,
                             double_angle=2)
    rng = np.random.default_rng(3)
    H = N // 2
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.7
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 27), k)
    while c.ring.nlimbs > 1:
        c = F.ct_modswitch_drop(c)
    eager = B.bootstrap(ctx, c)
    jitted = jax.jit(B.bootstrap)(ctx, c)
    assert jitted.ring is eager.ring
    assert jitted.enc.scale == eager.enc.scale
    for a, b in zip(eager.cs, jitted.cs):
        ap = np.asarray(ringops.ensure_primal(eager.ring, a).primal)
        bp = np.asarray(ringops.ensure_primal(eager.ring, b).primal)
        np.testing.assert_array_equal(ap, bp)


@pytest.mark.slow
def test_jit_bootstrap_cached(deep_mr):
    """jit_bootstrap_cached threads the encoded transform diagonals in
    as jit ARGUMENTS (device buffers, not HLO constants) and is
    bit-identical to the plain jit path."""
    params, kp, ctx0, k = deep_mr
    ctx = B.BootstrapContext(ek=ctx0.ek, gks=ctx0.gks, gk_conj=ctx0.gk_conj,
                             K=5.0, deg=24, plan=ctx0.plan, arcsin=True,
                             double_angle=2)
    rng = np.random.default_rng(3)
    H = N // 2
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.7
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 27), k)
    while c.ring.nlimbs > 1:
        c = F.ct_modswitch_drop(c)
    items, eager = B.record_plain_cache(ctx, c)
    assert len(items) > 0
    fn = B.jit_bootstrap_replay()
    cached = fn(ctx, c, items)
    assert cached.ring is eager.ring
    for a, b in zip(eager.cs, cached.cs):
        ap = np.asarray(ringops.ensure_primal(eager.ring, a).primal)
        bp = np.asarray(ringops.ensure_primal(eager.ring, b).primal)
        np.testing.assert_array_equal(ap, bp)


@pytest.mark.slow
def test_bootstrap_n128():
    """Factored bootstrap at N=128 (two butterfly levels per phase,
    radix 16): the production-N shape where dense BSGS would already
    need 64 diagonals per matrix."""
    n = 128
    ring = F.make_rns_ring(n, (30,) * 23)
    params = F.ModulusRaised(
        F.CKKSParams(ring, 0, 3.2, secret="sparse", hamming_weight=8))
    ks = jax.random.split(jax.random.PRNGKey(13), 4)
    kp = F.keygen(params, ks[0])
    ctx = B.setup_bootstrap(ks[1], kp.priv, K=6.0, deg=30, radix=16,
                            arcsin=True, double_angle=2)
    assert ctx.plan.nlevels == 2
    rng = np.random.default_rng(3)
    h = n // 2
    vals = (rng.uniform(-1, 1, h) + 1j * rng.uniform(-1, 1, h)) * 0.7
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 27), ks[2])
    while c.ring.nlimbs > 1:
        c = F.ct_modswitch_drop(c)
    out = B.bootstrap(ctx, c)
    assert out.ring.nlimbs >= 5
    np.testing.assert_allclose(F.decrypt(kp, out), vals, atol=2e-3)


@pytest.mark.slow
def test_trace_plain_cache(deep_mr):
    """trace_plain_cache (abstract trace, no execution) records exactly
    the items the eager record pass does — same sites, same order, same
    encoded duals bit-for-bit."""
    params, kp, ctx0, k = deep_mr
    ctx = B.BootstrapContext(ek=ctx0.ek, gks=ctx0.gks, gk_conj=ctx0.gk_conj,
                             K=5.0, deg=24, plan=ctx0.plan, arcsin=True,
                             double_angle=2)
    rng = np.random.default_rng(3)
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.7
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 27), k)
    while c.ring.nlimbs > 1:
        c = F.ct_modswitch_drop(c)
    eager_items, _ = B.record_plain_cache(ctx, c)
    traced_items = B.trace_plain_cache(ctx, c)
    assert len(traced_items) == len(eager_items) > 0
    for a, b in zip(eager_items, traced_items):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_composite_scale_bootstrap():
    """scale_limbs=2 (composite scaling): scale ≈ 2^52 spans two ~26-bit
    primes — the precision configuration for N ≥ 2^11 where a single
    <2^30 TPU-friendly prime cannot hold a production scale. Mixed
    tower: 2×29-bit base (q₀ ≈ 2^59), 26-bit level pairs, 29-bit
    raising primes. Checks the device FBC ModRaise lift, per-level
    scale pinning (out_scale) and two-limb rescales end to end: ~1e-5
    error where the single-prime config leaves ~2e-2."""
    n = 64
    h = n // 2
    L, dnum = 46, 10
    alpha = -(-L // dnum)
    k = alpha + 1
    ring = F.make_rns_ring(n, (29, 29) + (26,) * L + (29,) * k)
    params = F.HybridRaised(
        F.CKKSParams(ring, 0, 3.2, secret="sparse", hamming_weight=4),
        dnum=dnum, num_special=k)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    kp = F.keygen(params, ks[0])
    ctx = B.setup_bootstrap(ks[1], kp.priv, K=5.0, deg=24, radix=16,
                            arcsin=True, double_angle=2, scale_limbs=2)
    rng = np.random.default_rng(3)
    vals = (rng.uniform(-1, 1, h) + 1j * rng.uniform(-1, 1, h)) * 0.7
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 52), ks[2])
    while c.ring.nlimbs > 2:
        c = F.ct_modswitch_drop(c)
    out = B.bootstrap(ctx, c)
    assert out.ring.nlimbs >= 15       # ≥ 7 composite levels regained
    np.testing.assert_allclose(F.decrypt(kp, out), vals, atol=1e-4)


@pytest.mark.slow
def test_batched_bootstrap(deep_mr):
    """bootstrap_batched refreshes a ct_stack'ed batch in one vmapped
    program; every element matches its own single-ct refresh."""
    params, kp, ctx0, k = deep_mr
    ctx = B.BootstrapContext(ek=ctx0.ek, gks=ctx0.gks, gk_conj=ctx0.gk_conj,
                             K=5.0, deg=24, plan=ctx0.plan, arcsin=True,
                             double_angle=2)
    rng = np.random.default_rng(11)
    vals, cts = [], []
    for i in range(2):
        v = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.7
        c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, v,
                                           Fraction(2) ** 27),
                      jax.random.fold_in(k, i))
        while c.ring.nlimbs > 1:
            c = F.ct_modswitch_drop(c)
        vals.append(v)
        cts.append(c)
    out = B.bootstrap_batched(ctx, rlwe.ct_stack(cts))
    assert out.ring.nlimbs >= 6
    single0 = B.bootstrap(ctx, cts[0])
    got0 = F.decrypt(kp, rlwe.ct_index(out, 0))
    np.testing.assert_allclose(got0, vals[0], atol=5e-4)
    np.testing.assert_allclose(F.decrypt(kp, rlwe.ct_index(out, 1)),
                               vals[1], atol=5e-4)
    np.testing.assert_allclose(got0, F.decrypt(kp, single0), atol=1e-6)


@pytest.mark.slow
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


@pytest.mark.slow
def test_sharded_bootstrap_bit_equal():
    """RP-SHARDED bootstrap (round-4 VERDICT item 5): the ENTIRE jitted
    refresh — ModRaise, factored CoeffToSlot, EvalMod, SlotToCoeff, all
    riding rotate_sum keyswitches — with keys and ciphertext committed
    limb-wise to an rp mesh (parallel.sharding.shard_limbwise), GSPMD
    inserting the cross-limb collectives. Must be BIT-IDENTICAL to the
    single-device jitted refresh at a small factored hybrid config."""
    from toyfhe_tpu.parallel import sharding as S

    ring = F.make_rns_ring(N, (30,) * 16)      # 12 ct limbs + 4 specials
    params = F.HybridRaised(
        F.CKKSParams(ring, 0, 3.2, secret="sparse", hamming_weight=4),
        dnum=4, num_special=4)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    kp = F.keygen(params, ks[0])
    ctx = B.setup_bootstrap(ks[1], kp.priv, K=5.0, deg=8, radix=16)
    rng = np.random.default_rng(3)
    vals = (rng.uniform(-1, 1, H) + 1j * rng.uniform(-1, 1, H)) * 0.7
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 27), ks[2])
    while c.ring.nlimbs > 1:
        c = F.ct_modswitch_drop(c)

    ref = jax.jit(B.bootstrap)(ctx, c)
    mesh = S.make_mesh(n_rp=4, devices=jax.devices()[:4])
    out = jax.jit(B.bootstrap)(S.shard_limbwise(ctx, mesh),
                               S.shard_limbwise(c, mesh))
    assert out.ring is ref.ring and out.enc.scale == ref.enc.scale
    for a, b in zip(ref.cs, out.cs):
        np.testing.assert_array_equal(
            np.asarray(ringops.ensure_primal(ref.ring, a).primal),
            np.asarray(ringops.ensure_primal(out.ring, b).primal))
