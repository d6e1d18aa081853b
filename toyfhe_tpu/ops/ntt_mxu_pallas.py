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

    def redc(a, b):
        h2, l2 = mul32(a, b)
        m = l2 * ninv
        mh, _ = mul32(m, p)
        t = h2 + mh + (l2 != 0).astype(U32)
        return jnp.where(t >= p, t - p, t)

    t1 = redc(lo, r1m)
    t2 = redc(hi, him)
    v = t1 + t2
    v = jnp.where(v >= p, v - p, v)
    d = v - corr
    return jnp.where(v < corr, d + p, d)


def _mm_scalar(a, b, p, ninv):
    hi, lo = mul32(a, b)
    m = lo * ninv
    mh, _ = mul32(m, p)
    t = hi + mh + (lo != 0).astype(U32)
    return jnp.where(t >= p, t - p, t)


def _mod_dot_wx(xd, wd, cs, corr, r1m, him, p, ninv):
    """out[j, c] = Σ_k W[k, j]·X[k, c] mod p (contract both axis 0 —
    no transpose needed; W is symmetric Vandermonde anyway)."""
    groups = [None] * (2 * _NDIG - 1)
    for d in range(_NDIG):
        w = wd[d]
        for e in range(_NDIG):
            P = jax.lax.dot_general(
                w, xd[e], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = d + e
            groups[s] = P if groups[s] is None else groups[s] + P
    return _combine(groups, cs, corr, r1m, him, p, ninv)


def _mod_dot_xw(xd, wd, cs, corr, r1m, him, p, ninv):
    """out[r, j] = Σ_k X[r, k]·W[k, j] mod p (contract lhs 1, rhs 0)."""
    groups = [None] * (2 * _NDIG - 1)
    for d in range(_NDIG):
        w = wd[d]
        for e in range(_NDIG):
            P = jax.lax.dot_general(
                xd[e], w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            s = d + e
            groups[s] = P if groups[s] is None else groups[s] + P
    return _combine(groups, cs, corr, r1m, him, p, ninv)


def _fwd_kernel(x_ref, w1_ref, w2_ref, tw_ref, psi_ref, cs_ref, sc_ref,
                out_ref, *, rows, n2):
    # one grid cell = one (limb, row): keeps the Mosaic program small
    # (32 dots) — unrolling rows in-kernel made compilation explode.
    p = sc_ref[0, 0]
    ninv = sc_ref[0, 1]
    corr = sc_ref[0, 2]
    r1m = sc_ref[0, 3]
    him = sc_ref[0, 4]
    cs = [cs_ref[s, 0] for s in range(2 * _NDIG - 1)]
    x = _mm_scalar(x_ref[...], psi_ref[...], p, ninv)        # ψ-twist (N1, n2)
    # stage 1: A[k1, j2] = Σ_{j1} W1[j1, k1]·X[j1, j2]
    a = _mod_dot_wx(_digits_i8(x), w1_ref, cs, corr, r1m, him, p, ninv)
    b = _mm_scalar(a, tw_ref[...], p, ninv)                  # ⊙ ω^{k1·j2}
    # stage 2: C[k1, k2] = Σ_{j2} B[k1, j2]·W2[j2, k2]
    c = _mod_dot_xw(_digits_i8(b), w2_ref, cs, corr, r1m, him, p, ninv)
    out_ref[...] = c                                         # (k1, k2)


@functools.partial(jax.jit, static_argnums=(0, 3))
def ntt_mxu_pallas(mt: MxuNttTables, x, psis, interpret: bool = False):
    """Forward four-step NTT on the MXU via Pallas.

    x: uint32[L, R, N1, n2] (caller reshapes); psis: uint32[L, N1, n2]
    ψ-twist table in matching layout. Returns Ĉ[L, R, k1, k2]; natural
    dual = swapaxes(-1, -2).reshape(N).
    """
    L, R, _, n2 = x.shape
    cs = np.asarray(mt.cs)[:, :, 0, :].transpose(1, 0, 2)     # (L, 7, 1)
    sc = np.zeros((L, 1, 5), dtype=np.uint32)
    for l, p in enumerate(mt.primes):
        sc[l, 0] = [np.uint32(p), np.uint32(mt.mp.ninv[l, 0]),
                    np.uint32(mt.corr[l, 0, 0]), np.uint32(mt.r1_mont[l, 0, 0]),
                    np.uint32(mt.hi_mont[l, 0, 0])]
    kernel = functools.partial(_fwd_kernel, rows=R, n2=n2)
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
            pl.BlockSpec((None, 1, 5), lambda l, r: (l, 0, 0),
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
