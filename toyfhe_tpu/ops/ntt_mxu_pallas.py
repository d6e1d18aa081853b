"""Pallas kernel for the MXU four-step NTT.

ops/ntt_mxu.py expresses the four-step transform in plain jnp; through
XLA's einsum the int8 digit dots fail to reach MXU rates. This kernel
issues the dots directly inside Pallas — `jnp.dot` on int8 blocks with
``preferred_element_type=int32`` targets the MXU from Mosaic — and keeps
digit extraction, the 64-bit recombination and the twiddle multiply in
VMEM between the two matmul stages.

Layout contract (per limb): input ``x`` is the ψ-pre-twisted coefficient
block reshaped to (rows, N1, n2); output is Ĉ[row, k1, k2] — the caller
transposes (k1, k2) → natural order, or feeds the matching inverse
kernel directly in this layout (transposes cancel in fused products).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import modmath
from .modmath import U32, mul32
from .ntt_mxu import MxuNttTables, N1, _NDIG, _OFF

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:          # pragma: no cover
    pl = None


def _digits_i8(x):
    digs = []
    cur = x.astype(jnp.int32)
    for _ in range(_NDIG):
        r = cur & 255
        r = jnp.where(r >= 128, r - 256, r)
        cur = (cur - r) >> 8
        digs.append(r.astype(jnp.int8))
    return digs


def _redc(a, b, p, ninv):
    h2, l2 = mul32(a, b)
    m = l2 * ninv
    mh, _ = mul32(m, p)
    t = h2 + mh + (l2 != 0).astype(U32)
    return jnp.where(t >= p, t - p, t)


def _combine(groups, cs_ref, corr, r1m, him, p, ninv):
    """Σ_s 2^{8s}·G_s mod p via offset + (hi,lo) accumulation + 2 REDCs."""
    hi = lo = None
    for s in range(2 * _NDIG - 1):
        H = (groups[s] + jnp.int32(_OFF)).astype(U32)
        h, l = mul32(H, cs_ref[s])
        if hi is None:
            hi, lo = h, l
        else:
            nl = lo + l
            hi = hi + h + (nl < lo).astype(U32)
            lo = nl

    t1 = _redc(lo, r1m, p, ninv)
    t2 = _redc(hi, him, p, ninv)
    v = t1 + t2
    v = jnp.where(v >= p, v - p, v)
    d = v - corr
    return jnp.where(v < corr, d + p, d)


def _combine_paired(groups, cs32, cs48, corr2, r1m, him, p, ninv):
    """Paired-diagonal recombination: fold adjacent digit-diagonals into
    int32 (G'ₜ = G₂ₜ + 256·G₂ₜ₊₁, weights 2^{16t}) so only 2 of the 4
    accumulation terms need a mul32 (t=0,1 have exact power-of-two
    weights → shifts). Validity (|G'ₜ| < 2³¹) is a per-ring host-side
    property of the W digit matrices — asserted in MxuNttTables
    (``paired_ok``); holds with ~2× margin for Vandermonde digits."""
    gp = [groups[0] + (groups[1] << 8),
          groups[2] + (groups[3] << 8),
          groups[4] + (groups[5] << 8),
          groups[6]]
    # +2^31 offset via wraparound: bitcast(int32) + 2^31 ≡ value + 2^31
    hp = [g.astype(U32) + jnp.uint32(0x80000000) for g in gp]
    lo = hp[0]
    hi = jnp.zeros_like(lo)
    nl = lo + (hp[1] << 16)                       # weight 2^16: shift-add
    hi = hi + (hp[1] >> 16) + (nl < lo).astype(U32)
    lo = nl
    for hpt, c in ((hp[2], cs32), (hp[3], cs48)):
        h, l = mul32(hpt, c)
        nl = lo + l
        hi = hi + h + (nl < lo).astype(U32)
        lo = nl
    t1 = _redc(lo, r1m, p, ninv)
    t2 = _redc(hi, him, p, ninv)
    v = t1 + t2
    v = jnp.where(v >= p, v - p, v)
    d = v - corr2
    return jnp.where(v < corr2, d + p, d)


def _mm_scalar(a, b, p, ninv):
    hi, lo = mul32(a, b)
    m = lo * ninv
    mh, _ = mul32(m, p)
    t = hi + mh + (lo != 0).astype(U32)
    return jnp.where(t >= p, t - p, t)


def _dot_groups_wx(xd, wd):
    """Digit-diagonal dot groups for out[j, c] = Σ_k W[k, j]·X[k, c]
    (contract both axis 0 — no transpose needed; W is symmetric
    Vandermonde anyway)."""
    groups = [None] * (2 * _NDIG - 1)
    for d in range(_NDIG):
        w = wd[d]
        for e in range(_NDIG):
            P = jax.lax.dot_general(
                w, xd[e], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = d + e
            groups[s] = P if groups[s] is None else groups[s] + P
    return groups


def _dot_groups_xw(xd, wd):
    """Digit-diagonal dot groups for out[r, j] = Σ_k X[r, k]·W[k, j]
    (contract lhs 1, rhs 0)."""
    groups = [None] * (2 * _NDIG - 1)
    for d in range(_NDIG):
        w = wd[d]
        for e in range(_NDIG):
            P = jax.lax.dot_general(
                xd[e], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = d + e
            groups[s] = P if groups[s] is None else groups[s] + P
    return groups


def _mod_dot_wx(xd, wd, cs, corr, r1m, him, p, ninv):
    return _combine(_dot_groups_wx(xd, wd), cs, corr, r1m, him, p, ninv)


def _mod_dot_xw(xd, wd, cs, corr, r1m, him, p, ninv):
    return _combine(_dot_groups_xw(xd, wd), cs, corr, r1m, him, p, ninv)


def _fwd_kernel(x_ref, w1_ref, w2_ref, tw_ref, psi_ref, cs_ref, sc_ref,
                out_ref, *, rows, n2, paired):
    # one grid cell = one (limb, row): keeps the Mosaic program small
    # (32 dots) — unrolling rows in-kernel made compilation explode.
    p = sc_ref[0, 0]
    ninv = sc_ref[0, 1]
    corr = sc_ref[0, 2]
    r1m = sc_ref[0, 3]
    him = sc_ref[0, 4]
    if paired:
        cs32, cs48, corr2 = sc_ref[0, 5], sc_ref[0, 6], sc_ref[0, 7]
        comb = lambda g: _combine_paired(g, cs32, cs48, corr2, r1m, him,
                                         p, ninv)
    else:
        cs = [cs_ref[s, 0] for s in range(2 * _NDIG - 1)]
        comb = lambda g: _combine(g, cs, corr, r1m, him, p, ninv)
    x = _mm_scalar(x_ref[...], psi_ref[...], p, ninv)        # ψ-twist (N1, n2)
    # stage 1: A[k1, j2] = Σ_{j1} W1[j1, k1]·X[j1, j2]
    a = comb(_dot_groups_wx(_digits_i8(x), w1_ref))
    b = _mm_scalar(a, tw_ref[...], p, ninv)                  # ⊙ ω^{k1·j2}
    # stage 2: C[k1, k2] = Σ_{j2} B[k1, j2]·W2[j2, k2]
    c = comb(_dot_groups_xw(_digits_i8(b), w2_ref))
    out_ref[...] = c                                         # (k1, k2)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def ntt_mxu_pallas(mt: MxuNttTables, x, psis, interpret: bool = False,
                   paired: bool = None):
    """Forward four-step NTT on the MXU via Pallas.

    x: uint32[L, R, N1, n2] (caller reshapes); psis: uint32[L, N1, n2]
    ψ-twist table in matching layout. Returns Ĉ[L, R, k1, k2]; natural
    dual = swapaxes(-1, -2).reshape(N).

    ``paired`` selects the paired-diagonal recombination (2 mul32 + 2
    shift-adds instead of 7 mul32 per element) — defaults to on whenever
    the ring's digit matrices satisfy the int32 bound (mt.paired_ok).
    """
    if paired is None:
        paired = bool(mt.paired_ok)
    assert getattr(mt, "n1", N1) == N1, "layout kernel assumes n1=128"
    L, R, _, n2 = x.shape
    cs = np.asarray(mt.cs)[:, :, 0, :].transpose(1, 0, 2)     # (L, 7, 1)
    sc = np.zeros((L, 1, 8), dtype=np.uint32)
    for l, p in enumerate(mt.primes):
        sc[l, 0] = [np.uint32(p), np.uint32(mt.mp.ninv[l, 0]),
                    np.uint32(mt.corr[l, 0, 0]), np.uint32(mt.r1_mont[l, 0, 0]),
                    np.uint32(mt.hi_mont[l, 0, 0]),
                    np.uint32(mt.cs32[l, 0, 0]), np.uint32(mt.cs48[l, 0, 0]),
                    np.uint32(mt.corr2[l, 0, 0])]
    kernel = functools.partial(_fwd_kernel, rows=R, n2=n2, paired=paired)
    return pl.pallas_call(
        kernel,
        grid=(L, R),
        in_specs=[
            pl.BlockSpec((None, None, N1, n2), lambda l, r: (l, r, 0, 0)),
            pl.BlockSpec((None, _NDIG, N1, N1), lambda l, r: (l, 0, 0, 0)),
            pl.BlockSpec((None, _NDIG, n2, n2), lambda l, r: (l, 0, 0, 0)),
            pl.BlockSpec((None, N1, n2), lambda l, r: (l, 0, 0)),
            pl.BlockSpec((None, N1, n2), lambda l, r: (l, 0, 0)),
            pl.BlockSpec((None, 2 * _NDIG - 1, 1), lambda l, r: (l, 0, 0)),
            pl.BlockSpec((None, 1, 8), lambda l, r: (l, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, None, N1, n2), lambda l, r: (l, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((L, R, N1, n2), jnp.uint32),
        interpret=interpret,
    )(x, jnp.asarray(mt.w1), jnp.asarray(mt.w2), jnp.asarray(mt.tw),
      psis, jnp.asarray(cs), jnp.asarray(sc))


def ntt_mxu_pallas_natural(mt: MxuNttTables, x, interpret: bool = False):
    """Convenience wrapper: natural-order uint32[L, R, N] in/out."""
    L, R, n = x.shape
    n2 = mt.n2
    xm = x.reshape(L, R, N1, n2)
    psis = jnp.asarray(np.asarray(mt.psi_pow).reshape(len(mt.primes), N1, n2))
    c = ntt_mxu_pallas(mt, xm, psis, interpret)
    return jnp.swapaxes(c, -1, -2).reshape(L, R, n)


# ---------------------------------------------------------------------------
# natural-order [..., L, N] kernels — the production default on TPU
# ---------------------------------------------------------------------------
#
# Grid is (rows, limbs) so engine tensors [..., L, N] feed straight in
# (lead dims collapse to rows); the (k1, k2) ↔ natural transpose happens
# in VMEM inside the kernel, never as an HBM round-trip.

def _fwd_kernel_nat(x_ref, w1_ref, w2_ref, tw_ref, psi_ref, sc_ref,
                    out_ref):
    p, ninv = sc_ref[0, 0], sc_ref[0, 1]
    r1m, him = sc_ref[0, 3], sc_ref[0, 4]
    cs32, cs48, corr2 = sc_ref[0, 5], sc_ref[0, 6], sc_ref[0, 7]
    comb = lambda g: _combine_paired(g, cs32, cs48, corr2, r1m, him, p, ninv)
    x = _mm_scalar(x_ref[...], psi_ref[...], p, ninv)        # (N1, n2) [j1, j2]
    a = comb(_dot_groups_wx(_digits_i8(x), w1_ref))          # (N1, n2) [k1, j2]
    b = _mm_scalar(a, tw_ref[...], p, ninv)
    c = comb(_dot_groups_xw(_digits_i8(b), w2_ref))          # (N1, n2) [k1, k2]
    out_ref[...] = jnp.swapaxes(c, 0, 1)                     # [k2, k1] → natural


def _inv_kernel_nat(y_ref, w2i_ref, w1i_ref, twi_ref, ipsi_ref, sc_ref,
                    out_ref):
    """Transpose-FIRST inverse: the input relayout moves to the top so
    every elementwise pass (digits, combines, twiddle, untwist) runs in
    the (n1, n2) layout — with n2 = 128 that is full-lane VPU work
    (round-5 MFU lever). Same multiplies in the same per-element order
    as the historical j2-major body — bit-identical."""
    p, ninv = sc_ref[0, 0], sc_ref[0, 1]
    r1m, him = sc_ref[0, 3], sc_ref[0, 4]
    cs32, cs48, corr2 = sc_ref[0, 5], sc_ref[0, 6], sc_ref[0, 7]
    comb = lambda g: _combine_paired(g, cs32, cs48, corr2, r1m, him, p, ninv)
    y = jnp.swapaxes(y_ref[...], 0, 1)                       # (N1, n2) [k1, k2]
    d = comb(_dot_groups_xw(_digits_i8(y), w2i_ref))         # (N1, n2) [k1, j2]
    d = _mm_scalar(d, twi_ref[...], p, ninv)                 # ⊙ ω^{-k1·j2}
    x = comb(_dot_groups_wx(_digits_i8(d), w1i_ref))         # (N1, n2) [j1, j2]
    out_ref[...] = _mm_scalar(x, ipsi_ref[...], p, ninv)     # ψ⁻¹/n untwist


def _sc_table(mt: MxuNttTables) -> np.ndarray:
    sc = np.zeros((len(mt.primes), 1, 8), dtype=np.uint32)
    for l, p in enumerate(mt.primes):
        sc[l, 0] = [np.uint32(p), np.uint32(mt.mp.ninv[l, 0]),
                    np.uint32(mt.corr[l, 0, 0]),
                    np.uint32(mt.r1_mont[l, 0, 0]),
                    np.uint32(mt.hi_mont[l, 0, 0]),
                    np.uint32(mt.cs32[l, 0, 0]), np.uint32(mt.cs48[l, 0, 0]),
                    np.uint32(mt.corr2[l, 0, 0])]
    return sc


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _mxu_nat(mt: MxuNttTables, x, inverse: bool, interpret: bool = False):
    """Natural-order [..., L, N] four-step transform, paired combine.

    Table operands come from :func:`_nat_big_tables`: row views embed the
    shared ROOT constant and gather their rows in-jit; derived forms are
    memoized on the table object so repeated transforms at one level
    reuse one jaxpr constant (program-size discipline at production N).
    """
    lead = x.shape[:-2]
    L, n = x.shape[-2], x.shape[-1]
    n1, n2 = mt.n1, mt.n2
    R = int(np.prod(lead)) if lead else 1
    wA, wB, tww, psi = _nat_big_tables(mt, inverse)
    if inverse:
        xb = x.reshape((R, L, n2, n1))
        kernel = _inv_kernel_nat
        specA = pl.BlockSpec((None, _NDIG, n2, n2), lambda r, l: (l, 0, 0, 0))
        specB = pl.BlockSpec((None, _NDIG, n1, n1), lambda r, l: (l, 0, 0, 0))
        spec_tw = pl.BlockSpec((None, n1, n2), lambda r, l: (l, 0, 0))
        spec_io = pl.BlockSpec((None, None, n2, n1), lambda r, l: (r, l, 0, 0))
        out_block = pl.BlockSpec((None, None, n1, n2), lambda r, l: (r, l, 0, 0))
        out_shape = jax.ShapeDtypeStruct((R, L, n1, n2), jnp.uint32)
    else:
        xb = x.reshape((R, L, n1, n2))
        kernel = _fwd_kernel_nat
        specA = pl.BlockSpec((None, _NDIG, n1, n1), lambda r, l: (l, 0, 0, 0))
        specB = pl.BlockSpec((None, _NDIG, n2, n2), lambda r, l: (l, 0, 0, 0))
        spec_tw = pl.BlockSpec((None, n1, n2), lambda r, l: (l, 0, 0))
        spec_io = pl.BlockSpec((None, None, n1, n2), lambda r, l: (r, l, 0, 0))
        out_block = pl.BlockSpec((None, None, n2, n1), lambda r, l: (r, l, 0, 0))
        out_shape = jax.ShapeDtypeStruct((R, L, n2, n1), jnp.uint32)
    spec_psi = pl.BlockSpec((None, n1, n2), lambda r, l: (l, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(R, L),
        in_specs=[spec_io, specA, specB, spec_tw, spec_psi,
                  pl.BlockSpec((None, 1, 8), lambda r, l: (l, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=out_block,
        out_shape=out_shape,
        interpret=interpret,
    )(xb, wA, wB, tww, psi,
      jnp.asarray(mt.cached("sc", lambda: _sc_table(mt))))
    return out.reshape(lead + (L, n))


def _nat_big_tables(mt, inverse: bool):
    """(wA, wB, tw, psi) operands for :func:`_mxu_nat`.

    MxuRowView: gather rows in-jit from the ROOT's arrays (memoized on
    the root — ONE shared constant per compiled program across all tower
    levels). Full tables: memoized derived numpy forms (reshape/swap
    create fresh objects per call otherwise, each a fresh constant)."""
    from .ntt_mxu import MxuRowView

    if isinstance(mt, MxuRowView):
        root = mt.root
        Lr, n1, n2 = len(root.primes), root.n1, root.n2
        rows = jnp.asarray(np.asarray(mt.rows))
        take = lambda a: jnp.take(jnp.asarray(a), rows, axis=0)
        if inverse:
            return (take(root.w2i), take(root.w1i), take(root.twi),
                    take(root.cached("ipsi_nat", lambda: np.asarray(
                        root.psi_ipow).reshape(Lr, n1, n2))))
        return (take(root.w1), take(root.w2), take(root.tw),
                take(root.cached("psi_nat", lambda: np.asarray(
                    root.psi_pow).reshape(Lr, n1, n2))))
    L, n1, n2 = len(mt.primes), mt.n1, mt.n2
    if inverse:
        return (jnp.asarray(mt.w2i), jnp.asarray(mt.w1i),
                jnp.asarray(mt.twi),
                jnp.asarray(mt.cached("ipsi_nat", lambda: np.asarray(
                    mt.psi_ipow).reshape(L, n1, n2))))
    return (jnp.asarray(mt.w1), jnp.asarray(mt.w2), jnp.asarray(mt.tw),
            jnp.asarray(mt.cached("psi_nat", lambda: np.asarray(
                mt.psi_pow).reshape(L, n1, n2))))


def ntt_mxu_nat(mt: MxuNttTables, x, interpret: bool = False):
    """Forward negacyclic NTT, natural order, [..., L, N] in/out."""
    return _mxu_nat(mt, x, False, interpret)


def intt_mxu_nat(mt: MxuNttTables, x, interpret: bool = False):
    """Inverse negacyclic NTT, natural order, [..., L, N] in/out."""
    return _mxu_nat(mt, x, True, interpret)
