"""Pallas TPU kernels for fused negacyclic polynomial arithmetic.

The XLA path (ops/ntt.py) already runs a *standalone* batched NTT at the
HBM roofline — stages fuse on-chip. What XLA cannot do is fuse across
the transform boundaries of a composite op: a negacyclic multiply is
NTT(a), NTT(b), pointwise, INTT — four HBM round-trips of intermediates.
These kernels keep the whole composite in VMEM: one read of the inputs,
one write of the result.

Formulation chosen for the TPU vector unit (no in-kernel reshapes or
gathers):
  * forward = ψ-twist + Gentleman–Sande DIF stages (natural input →
    bit-reversed output);
  * inverse = Cooley–Tukey DIT stages with inverse twiddles
    (bit-reversed input → natural output) + N⁻¹ψ⁻ⁱ untwist;
  * a butterfly stage is two lane-rolls plus a mask-select — the
    half-selection mask is just bit `half` of the lane index, computed
    with a broadcasted iota (no mask tables);
  * pointwise products happen in bit-reversed order between DIF and DIT,
    so no bit-reversal permutation exists anywhere.

Twiddles are full-length per-stage tables in Montgomery form, one set
per limb, streamed to VMEM per grid step.

Reference semantics: nntt/inntt at pow2_cyc_rings.jl:295-318; this
kernel is the "centerpiece native kernel" of SURVEY §2.8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import modmath
from .modmath import U32
from .ntt import NttTables, _to_mont_np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:          # pragma: no cover
    HAVE_PALLAS = False


# ---------------------------------------------------------------------------
# host-side stage-twiddle tables (full-length, mask-free)
# ---------------------------------------------------------------------------

class PallasNttTables:
    """Per-limb full-length stage twiddles for the DIF/DIT formulation.

    fwd[s][i]  : DIF stage s (len = N >> s): ω^{(i mod len − half)·N/len}
                 on second halves (1 on first halves — unused there).
    inv[s][i]  : DIT stage s (len = 2 << s): ω^{−(i mod len mod half)·N/len}
                 replicated across both halves.
    All Montgomery form. Shapes: (L, logN, N) uint32.
    """

    def __init__(self, tables: NttTables):
        n = tables.n
        logn = n.bit_length() - 1
        L = len(tables.primes)
        self.n, self.logn, self.L = n, logn, L
        self.primes = tables.primes
        fwd = np.zeros((L, logn, n), dtype=np.uint32)
        inv = np.zeros((L, logn, n), dtype=np.uint32)
        idx = np.arange(n)
        for l, (p, psi) in enumerate(zip(tables.primes, tables.psis)):
            omega = psi * psi % p
            iomega = pow(omega, -1, p)
            # DIF: stage s has len = n >> s
            for s in range(logn):
                ln = n >> s
                half = ln // 2
                j = idx % ln
                e = np.where(j >= half, (j - half) * (n // ln), 0)
                pw = np.array([pow(omega, int(t), p) for t in np.unique(e)])
                lut = dict(zip([int(t) for t in np.unique(e)], pw))
                fwd[l, s] = _to_mont_np(
                    np.array([lut[int(t)] for t in e], dtype=object), p)
            # DIT: stage s has len = 2 << s
            for s in range(logn):
                ln = 2 << s
                half = ln // 2
                j = idx % half
                e = j * (n // ln)
                uniq = np.unique(e)
                lut = {int(t): pow(iomega, int(t), p) for t in uniq}
                inv[l, s] = _to_mont_np(
                    np.array([lut[int(t)] for t in e], dtype=object), p)
        self.fwd = fwd
        self.inv = inv
        # (L, 1, N) so Pallas blocks satisfy the (8,128) tiling rule
        self.psi_pow = tables.psi_pow[:, None, :]
        self.psi_ipow = tables.psi_ipow[:, None, :]
        self.p = tables.mp.p.reshape(-1).astype(np.uint32)       # (L,)
        self.ninv = tables.mp.ninv.reshape(-1).astype(np.uint32)
        self.r2 = tables.mp.r2.reshape(-1).astype(np.uint32)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


# ---------------------------------------------------------------------------
# in-kernel primitives
# ---------------------------------------------------------------------------

def _mm(a, b, p, ninv):
    """Montgomery product with scalar p, ninv (b in Montgomery form)."""
    hi, lo = modmath.mul32(a, b)
    m = lo * ninv
    mp_hi, _ = modmath.mul32(m, p)
    t = hi + mp_hi + (lo != 0).astype(U32)
    return jnp.where(t >= p, t - p, t)


def _add(a, b, p):
    t = a + b
    return jnp.where(t >= p, t - p, t)


def _sub(a, b, p):
    t = a - b
    return jnp.where(a < b, t + p, t)


def _roll(x, shift):
    if HAVE_PALLAS and not isinstance(x, np.ndarray):
        try:
            return pltpu.roll(x, shift, axis=1)
        except Exception:
            pass
    return jnp.roll(x, shift, axis=1)


def _dif_stages(x, tw_ref, lane, p, ninv, logn, n, buf=None):
    """Gentleman–Sande: natural → bit-reversed. If ``buf`` is a VMEM ref,
    each stage round-trips through it to bound the live temporary set
    (keeps Mosaic's scoped-vmem stack under the 16 MB limit)."""
    for s in range(logn):
        half = (n >> s) // 2
        first = (lane & half) == 0
        up = _roll(x, -half)           # partner x[i+half] at position i
        dn = _roll(x, half)            # partner x[i-half] at position i
        w = tw_ref[s, :]
        x = jnp.where(first, _add(x, up, p), _mm(_sub(dn, x, p), w, p, ninv))
        if buf is not None:
            buf[...] = x
            x = buf[...]
    return x


def _dit_stages(x, tw_ref, lane, p, ninv, logn, n, buf=None):
    """Cooley–Tukey with inverse twiddles: bit-reversed → natural."""
    for s in range(logn):
        half = 1 << s
        first = (lane & half) == 0
        w = tw_ref[s, :]
        wv = _mm(x, w, p, ninv)        # w·x at every position
        up = _roll(wv, -half)          # w·x[i+half] at i
        dn = _roll(x, half)            # x[i-half] at i
        x = jnp.where(first, _add(x, up, p), _sub(dn, wv, p))
        if buf is not None:
            buf[...] = x
            x = buf[...]
    return x


# ---------------------------------------------------------------------------
# fused negacyclic multiply kernel
# ---------------------------------------------------------------------------

def _polymul_kernel(a_ref, b_ref, fwd_ref, inv_ref, psi_ref, ipsi_ref,
                    pn_ref, out_ref, da_buf, db_buf, *, logn, n):
    p = pn_ref[0, 0]
    ninv = pn_ref[0, 1]
    lane = jax.lax.broadcasted_iota(jnp.uint32, a_ref.shape, 1)
    psi = psi_ref[0, :]
    ipsi = ipsi_ref[0, :]

    def fwd(in_ref, buf):
        buf[...] = _mm(in_ref[...], psi, p, ninv)
        return _dif_stages(buf[...], fwd_ref, lane, p, ninv, logn, n, buf)

    da = fwd(a_ref, da_buf)
    db = fwd(b_ref, db_buf)
    da_buf[...] = _mm(_mm(da, pn_ref[0, 2], p, ninv), db, p, ninv)
    x = _dit_stages(da_buf[...], inv_ref, lane, p, ninv, logn, n, da_buf)
    out_ref[...] = _mm(x, ipsi, p, ninv)


def polymul_pallas_raw(pt: PallasNttTables, a, b, rows_per_block: int = 8,
                       interpret: bool = False):
    """Traceable (un-jitted) fused negacyclic multiply — compose freely
    inside larger jitted programs."""
    L, R, n = a.shape
    logn = pt.logn
    rb = min(rows_per_block, R)
    assert R % rb == 0
    pn = np.stack([pt.p, pt.ninv, pt.r2], axis=1).astype(np.uint32)[:, None, :]

    grid = (L, R // rb)
    kernel = functools.partial(_polymul_kernel, logn=logn, n=n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, rb, n), lambda l, r: (l, r, 0)),
            pl.BlockSpec((None, rb, n), lambda l, r: (l, r, 0)),
            pl.BlockSpec((None, logn, n), lambda l, r: (l, 0, 0)),
            pl.BlockSpec((None, logn, n), lambda l, r: (l, 0, 0)),
            pl.BlockSpec((None, 1, n), lambda l, r: (l, 0, 0)),
            pl.BlockSpec((None, 1, n), lambda l, r: (l, 0, 0)),
            pl.BlockSpec((None, 1, 3), lambda l, r: (l, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, rb, n), lambda l, r: (l, r, 0)),
        out_shape=jax.ShapeDtypeStruct((L, R, n), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((rb, n), jnp.uint32),
                        pltpu.VMEM((rb, n), jnp.uint32)],
        interpret=interpret,
    )(a, b, jnp.asarray(pt.fwd), jnp.asarray(pt.inv),
      jnp.asarray(pt.psi_pow), jnp.asarray(pt.psi_ipow), jnp.asarray(pn))


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def polymul_pallas(pt: PallasNttTables, a, b, rows_per_block: int = 8,
                   interpret: bool = False):
    """Fused negacyclic multiply: primal uint32[L, R, N] × same → primal.
    One pallas_call computes NTT(a)·NTT(b) and the inverse transform
    entirely in VMEM (== intt(mul_mod(ntt(a), ntt(b))) per limb)."""
    return polymul_pallas_raw(pt, a, b, rows_per_block, interpret)


# ---------------------------------------------------------------------------
# standalone transforms (bit-reversed dual convention), for benchmarking
# ---------------------------------------------------------------------------

def _fwd_kernel(a_ref, fwd_ref, psi_ref, pn_ref, out_ref, buf, *, logn, n):
    p = pn_ref[0, 0]
    ninv = pn_ref[0, 1]
    lane = jax.lax.broadcasted_iota(jnp.uint32, a_ref.shape, 1)
    buf[...] = _mm(a_ref[...], psi_ref[0, :], p, ninv)
    out_ref[...] = _dif_stages(buf[...], fwd_ref, lane, p, ninv, logn, n, buf)


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def ntt_pallas_bitrev(pt: PallasNttTables, a, rows_per_block: int = 8,
                      interpret: bool = False):
    """Forward negacyclic NTT, output in bit-reversed order."""
    L, R, n = a.shape
    logn = pt.logn
    rb = min(rows_per_block, R)
    assert R % rb == 0
    pn = np.stack([pt.p, pt.ninv, pt.r2], axis=1).astype(np.uint32)[:, None, :]
    kernel = functools.partial(_fwd_kernel, logn=logn, n=n)
    return pl.pallas_call(
        kernel,
        grid=(L, R // rb),
        in_specs=[
            pl.BlockSpec((None, rb, n), lambda l, r: (l, r, 0)),
            pl.BlockSpec((None, logn, n), lambda l, r: (l, 0, 0)),
            pl.BlockSpec((None, 1, n), lambda l, r: (l, 0, 0)),
            pl.BlockSpec((None, 1, 3), lambda l, r: (l, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((None, rb, n), lambda l, r: (l, r, 0)),
        out_shape=jax.ShapeDtypeStruct((L, R, n), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((rb, n), jnp.uint32)],
        interpret=interpret,
    )(a, jnp.asarray(pt.fwd), jnp.asarray(pt.psi_pow), jnp.asarray(pn))
