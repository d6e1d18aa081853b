"""Pallas fused-kernel correctness vs the XLA path (interpret mode on CPU;
the same kernels compile for TPU and are benchmarked in bench.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from toyfhe_tpu.ops import modmath, ntt as nttmod
from toyfhe_tpu.ops import ntt_pallas as npal
from toyfhe_tpu.utils import numtheory as nt


@pytest.fixture(scope="module")
def rings():
    n, L, R = 256, 2, 8
    t = nttmod.NttTables(n, nt.ntt_prime_chain(n, (29, 28)))
    pt = npal.PallasNttTables(t)
    rng = np.random.default_rng(0)
    a = np.stack([np.stack([rng.integers(0, p, n, dtype=np.uint32)
                            for _ in range(R)]) for p in t.primes])
    b = np.stack([np.stack([rng.integers(0, p, n, dtype=np.uint32)
                            for _ in range(R)]) for p in t.primes])
    return t, pt, a, b


@pytest.mark.slow
def test_fused_polymul(rings):
    t, pt, a, b = rings
    at = jnp.asarray(a.transpose(1, 0, 2))
    bt = jnp.asarray(b.transpose(1, 0, 2))
    ref = np.asarray(nttmod.intt(
        t, modmath.mul_mod(nttmod.ntt(t, at), nttmod.ntt(t, bt), t.mp))
    ).transpose(1, 0, 2)
    got = np.asarray(npal.polymul_pallas(pt, jnp.asarray(a), jnp.asarray(b),
                                         8, True))
    np.testing.assert_array_equal(got, ref)


def test_fwd_bitrev(rings):
    t, pt, a, _ = rings
    nat = np.asarray(nttmod.ntt(t, jnp.asarray(a.transpose(1, 0, 2)))
                     ).transpose(1, 0, 2)
    brev = nttmod._bitrev_perm(t.n)
    got = np.asarray(npal.ntt_pallas_bitrev(pt, jnp.asarray(a), 8, True))
    np.testing.assert_array_equal(got, nat[:, :, brev])


def test_mxu_four_step(rings):
    """MXU four-step NTT is bit-exact vs the radix-2 path (CPU check;
    einsum digit dots run on any backend)."""
    from toyfhe_tpu.ops import ntt_mxu as mxu
    t, pt, a, _ = rings
    mt = mxu.MxuNttTables(t)
    at = jnp.asarray(a.transpose(1, 0, 2))
    np.testing.assert_array_equal(
        np.asarray(mxu.ntt_mxu(mt, at)), np.asarray(nttmod.ntt(t, at)))
    np.testing.assert_array_equal(
        np.asarray(mxu.intt_mxu(mt, at)), np.asarray(nttmod.intt(t, at)))


def test_mxu_pallas_kernel(rings):
    """Pallas four-step MXU kernel bit-exact vs radix-2 (interpret mode)."""
    from toyfhe_tpu.ops import ntt_mxu as mxu
    from toyfhe_tpu.ops import ntt_mxu_pallas as mxp
    t, pt, a, _ = rings
    mt = mxu.MxuNttTables(t)
    got = np.asarray(mxp.ntt_mxu_pallas_natural(mt, jnp.asarray(a), True))
    ref = np.asarray(nttmod.ntt(t, jnp.asarray(a.transpose(1, 0, 2)))
                     ).transpose(1, 0, 2)
    np.testing.assert_array_equal(got, ref)


def test_mxu_pallas_paired_modes(rings):
    """Both recombination modes of the MXU Pallas kernel are bit-exact,
    and the paired-diagonal int32 bound holds for the test ring."""
    from toyfhe_tpu.ops import ntt_mxu as mxu
    from toyfhe_tpu.ops import ntt_mxu_pallas as mxp
    t, pt, a, _ = rings
    mt = mxu.MxuNttTables(t)
    assert mt.paired_ok
    xm = jnp.asarray(a).reshape(len(t.primes), a.shape[1], mxp.N1, mt.n2)
    psis = jnp.asarray(np.asarray(mt.psi_pow).reshape(
        len(t.primes), mxp.N1, mt.n2))
    unp = np.asarray(mxp.ntt_mxu_pallas(mt, xm, psis, True, False))
    par = np.asarray(mxp.ntt_mxu_pallas(mt, xm, psis, True, True))
    np.testing.assert_array_equal(par, unp)


def test_mxu_nat_roundtrip(rings):
    """Natural-order [..., L, N] MXU kernels (production default on TPU):
    forward matches radix-2 bit-exactly, inverse inverts."""
    from toyfhe_tpu.ops import ntt_mxu as mxu
    from toyfhe_tpu.ops import ntt_mxu_pallas as mxp
    t, pt, a, _ = rings
    mt = mxu.MxuNttTables(t)
    x = jnp.asarray(a.transpose(1, 0, 2))          # [R, L, N]
    fwd = np.asarray(mxp.ntt_mxu_nat(mt, x, True))
    np.testing.assert_array_equal(fwd, np.asarray(nttmod.ntt(t, x)))
    back = np.asarray(mxp.intt_mxu_nat(mt, jnp.asarray(fwd), True))
    np.testing.assert_array_equal(back, np.asarray(x))
    # 2-D (no lead dims) and 4-D leads
    x2 = x[0]
    np.testing.assert_array_equal(
        np.asarray(mxp.ntt_mxu_nat(mt, x2, True)),
        np.asarray(nttmod.ntt(t, x2)))
    x4 = x.reshape((2, 4) + x.shape[1:])
    np.testing.assert_array_equal(
        np.asarray(mxp.intt_mxu_nat(mt, x4, True)),
        np.asarray(nttmod.intt(t, x4)))


def test_mxu_row_view_bitexact():
    """Derived-tower MXU row views (shared root constants, rows gathered
    in-jit — the production-N program-size fix) are bit-identical to
    tables built directly for the sub-tower."""
    import toyfhe_tpu as F
    from toyfhe_tpu.ops import ntt_mxu as mxu
    from toyfhe_tpu.ops import ntt_mxu_pallas as mxp

    ring = F.make_rns_ring(256, (28, 29, 28, 29, 28))
    child = ring.select([0, 1, 3])             # non-contiguous sub-tower
    assert child.tables.root_tables is ring.tables
    root_mt = mxu.MxuNttTables(ring.tables)
    view = mxu.MxuRowView(root_mt, child.tables.root_rows)
    own = mxu.MxuNttTables(child.tables)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, min(child.primes),
                                 (2, 3, 256)).astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(mxp.ntt_mxu_nat(view, x, True)),
        np.asarray(mxp.ntt_mxu_nat(own, x, True)))
    np.testing.assert_array_equal(
        np.asarray(mxp.intt_mxu_nat(view, x, True)),
        np.asarray(mxp.intt_mxu_nat(own, x, True)))
    # legacy consumers read materialized slices
    np.testing.assert_array_equal(np.asarray(view.tw), np.asarray(own.tw))
    assert view.primes == own.primes


def test_mxu_nat_n1_factorizations(rings):
    """Parameterized four-step factorization (round-5 MFU lever): tables
    built with n1 = N/128 make n2 = 128 — a full-lane minor dim for
    every in-kernel elementwise pass. All factorizations must be
    bit-identical to the radix-2 path, forward and inverse."""
    from toyfhe_tpu.ops import ntt_mxu as mxu
    from toyfhe_tpu.ops import ntt_mxu_pallas as mxp
    t, pt, a, _ = rings
    x = jnp.asarray(a.transpose(1, 0, 2))          # [R, L, N] at N=256
    ref_f = np.asarray(nttmod.ntt(t, x))
    ref_i = np.asarray(nttmod.intt(t, x))
    for n1 in (2, 8, 64, 128):                     # n2 = 128, 32, 4, 2
        mt = mxu.MxuNttTables(t, n1=n1)
        assert mt.n1 == n1 and mt.n1 * mt.n2 == t.n
        np.testing.assert_array_equal(
            np.asarray(mxp.ntt_mxu_nat(mt, x, True)), ref_f)
        np.testing.assert_array_equal(
            np.asarray(mxp.intt_mxu_nat(mt, x, True)), ref_i)
        # einsum (non-pallas) path agrees too
        np.testing.assert_array_equal(np.asarray(mxu.ntt_mxu(mt, x)), ref_f)
        np.testing.assert_array_equal(np.asarray(mxu.intt_mxu(mt, x)), ref_i)


def test_fused_hybrid_ks_n1(rings):
    """FusedHybridKS under a non-default factorization stays bit-equal
    to the default-table kernel."""
    import jax
    import toyfhe_tpu as F
    from toyfhe_tpu.ops.pallas_hybrid_ks import FusedHybridKS

    ring = F.make_rns_ring(256, (28,) * 4 + (29,) * 2)
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), 2, 2)
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.integers(0, min(ring.primes),
                                 (2, 4, 256)).astype(np.uint32))
    import os
    fks = FusedHybridKS(params, ek)
    a1, a2 = fks(fks.premultiply(y), interpret=True)
    os.environ["TOYFHE_MXU_N1"] = "2"
    try:
        fks2 = FusedHybridKS(params, ek)
        assert fks2.mt.n1 == 2
        b1, b2 = fks2(fks2.premultiply(y), interpret=True)
    finally:
        del os.environ["TOYFHE_MXU_N1"]
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(b1))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))
