"""Fused MXU hybrid key-switch core (the round-1 VERDICT's named lever).

The XLA hybrid key-switch materializes the digit tensor — dnum × (Lt+k)
ring rows — in HBM, round-trips it through the batched MXU NTT, then
through the key contraction. This kernel computes, per (batch row,
output limb), the whole digit pipeline in VMEM:

    FBC digit (Σᵢ ŷᵢ·[Q_j/qᵢ]_{p_t})  →  four-step MXU NTT (int8 digit
    dots, paired recombination)  →  ⊙ key[j, t], accumulated over j

The [dnum, Lt+k, N] digit tensor never exists in HBM, each digit's
forward transform feeds the contraction while still in VMEM, and the
Mosaic program per grid cell stays the size of the proven natural-order
NTT kernel (32 dots): the digit axis is a GRID dimension with
accumulate-into-output semantics, not an in-kernel unroll (which
explodes compilation — ops/ntt_mxu_pallas.py's row lesson).

Replaces (in core/hybrid.py terms): hybrid_decompose's contraction +
ntt(digits) + the masks/maskeds mul_mod/mod_sum. The ŷ premultiply
(per-limb, cheap), the accumulator inverse transforms and the
P-division rescale chain stay outside.

Used by parallel/ops.py::make_hybrid_sharded_step(fused=True);
bit-exactness vs the unfused schedule: tests/test_fused_keyswitch.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .ntt_mxu import MxuNttTables, N1, _NDIG
from .ntt_mxu_pallas import (_combine_paired, _digits_i8, _dot_groups_wx,
                             _dot_groups_xw, _mm_scalar, _sc_table)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:          # pragma: no cover
    pl = None


def _fused_kernel(y_ref, cst_ref, w1_ref, w2_ref, tw_ref, psi_ref,
                  km_ref, kd_ref, sc_ref, acc2_ref, acc1_ref, *, alpha):
    """Grid (r, t, j), j innermost: one digit's FBC + forward NTT + key
    contraction, accumulated into the (r, t) output block across j."""
    j = pl.program_id(2)
    p, ninv = sc_ref[0, 0], sc_ref[0, 1]
    r1m, him = sc_ref[0, 3], sc_ref[0, 4]
    cs32, cs48, corr2 = sc_ref[0, 5], sc_ref[0, 6], sc_ref[0, 7]
    comb = lambda g: _combine_paired(g, cs32, cs48, corr2, r1m, him, p, ninv)

    # FBC digit at limb t: Σᵢ ŷᵢ·constᵢ (consts Montgomery ⇒ one REDC
    # each; ŷ raw < 2^32 is safe for REDC's a-operand)
    dig = None
    for i in range(alpha):
        term = _mm_scalar(y_ref[i], cst_ref[0, i], p, ninv)
        if dig is None:
            dig = term
        else:
            s = dig + term
            dig = jnp.where(s >= p, s - p, s)

    # four-step forward NTT (natural kernel body, ops/ntt_mxu_pallas.py)
    x = _mm_scalar(dig, psi_ref[...], p, ninv)               # ψ-twist
    a = comb(_dot_groups_wx(_digits_i8(x), w1_ref))          # [k1, j2]
    b = _mm_scalar(a, tw_ref[...], p, ninv)
    c = comb(_dot_groups_xw(_digits_i8(b), w2_ref))          # [k1, k2]
    cn = jnp.swapaxes(c, 0, 1)                               # natural (n2, N1)

    # key contraction: keys pre-Montgomerized ⇒ one REDC per element
    t1 = _mm_scalar(cn, kd_ref[...], p, ninv)
    t2 = _mm_scalar(cn, km_ref[...], p, ninv)

    @pl.when(j == 0)
    def _init():
        acc1_ref[...] = t1
        acc2_ref[...] = t2

    @pl.when(j > 0)
    def _acc():
        s1 = acc1_ref[...] + t1
        acc1_ref[...] = jnp.where(s1 >= p, s1 - p, s1)
        s2 = acc2_ref[...] + t2
        acc2_ref[...] = jnp.where(s2 >= p, s2 - p, s2)


class FusedHybridKS:
    """Host wrapper: precomputes padded FBC tables, digit matrices and
    pre-Montgomerized key duals for one (HybridRaised params, eval key,
    tower length) triple.

    ``__call__(y)``: ŷ tensor uint32[..., L0, N] (each ct limb already
    multiplied by [(Q_j/qᵢ)⁻¹]_{qᵢ} — core/hybrid.py's per-limb
    premultiply) → (acc1, acc2) natural duals uint32[..., T, N] over the
    expanded tower: acc1 = Σⱼ maskedsⱼ ⊙ NTT(Dⱼ), acc2 with masks.
    """

    def __init__(self, params, ek, lt: int = None):
        from ..core import ring as R

        full = params.ring_cipher
        lt = full.nlimbs if lt is None else lt
        exp_ring, groups = params._tables(lt)
        self.exp_ring = exp_ring
        from .ntt_mxu import lane_optimal_n1
        import os as _os
        _n1 = (None if _os.environ.get("TOYFHE_MXU_N1")
               else lane_optimal_n1(exp_ring.tables.n))
        self.mt = MxuNttTables(exp_ring.tables, n1=_n1)
        assert self.mt.paired_ok, "fused kernel needs the paired bound"
        T = exp_ring.nlimbs
        n, n2 = self.mt.n, self.mt.n2
        n1 = self.mt.n1
        self.dnum_t = len(groups)
        self.alpha = max(hi - lo for (lo, hi), _, _ in groups)
        self.bounds = [g[0] for g in groups]
        self.lt = lt

        # FBC constants [dnum_t, T, alpha] (Montgomery form, zero-padded)
        # + the per-ct-limb ŷ premultiply column [(Q_j/qᵢ)⁻¹]_{qᵢ}
        cst = np.zeros((self.dnum_t, T, self.alpha), dtype=np.uint32)
        inv_col = np.zeros((lt, 1), dtype=np.uint32)
        for j, ((lo, hi), inv, consts) in enumerate(groups):
            cst[j, :, :hi - lo] = np.asarray(consts)[:, :, 0]
            inv_col[lo:hi] = np.asarray(inv)
        self.cst = cst
        self.inv_col = inv_col
        self.ct_ring = full.select(list(range(lt)))

        # pre-Montgomerized key duals in natural (n2, N1) blocks
        key_ring = params.ring_key
        which = params.hybrid_key_limbs(exp_ring)
        km, kd = [], []
        for comp in ek.key.key[:self.dnum_t]:
            _, m = R.limb_select(key_ring, R.ensure_dual(key_ring, comp.mask),
                                 which)
            _, md = R.limb_select(key_ring,
                                  R.ensure_dual(key_ring, comp.masked), which)
            km.append(np.asarray(m.dual))
            kd.append(np.asarray(md.dual))
        km = np.stack(km, 0).astype(np.uint64)            # [dnum, T, N]
        kd = np.stack(kd, 0).astype(np.uint64)
        pr = np.asarray(exp_ring.primes, dtype=np.uint64)[None, :, None]
        km = (km << 32) % pr
        kd = (kd << 32) % pr
        self.km = km.astype(np.uint32).reshape(self.dnum_t, T, n2, n1)
        self.kd = kd.astype(np.uint32).reshape(self.dnum_t, T, n2, n1)
        self.psi = np.asarray(self.mt.psi_pow).reshape(T, n1, n2)
        self.sc = _sc_table(self.mt)
        # Mosaic targets TPU; everywhere else run the interpreter
        self.interpret = jax.default_backend() != "tpu"

    def premultiply(self, xp):
        """ct-limb residues uint32[..., L0, N] primal → ŷ (per-limb
        multiply by [(Q_{j(i)}/qᵢ)⁻¹]_{qᵢ} — core/hybrid.py's per-group
        premultiply assembled into one column)."""
        from . import modmath

        return modmath.mont_mul(xp, jnp.asarray(self.inv_col),
                                self.ct_ring.mp)

    def __call__(self, y, interpret: bool = None):
        interpret = self.interpret if interpret is None else interpret
        mt = self.mt
        n, n2 = mt.n, mt.n2
        N1 = mt.n1          # shadows the module tile constant on purpose
        T, dnum, alpha = self.exp_ring.nlimbs, self.dnum_t, self.alpha
        lead = y.shape[:-2]
        R_ = int(np.prod(lead)) if lead else 1
        # pad the group rows to uniform alpha and reshape (N1, n2)
        yp = y.reshape((R_, self.lt, N1, n2))
        blocks = []
        for (lo, hi) in self.bounds:
            blk = yp[:, lo:hi]
            if hi - lo < alpha:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((R_, alpha - (hi - lo), N1, n2),
                                    jnp.uint32)], axis=1)
            blocks.append(blk)
        y4 = jnp.stack(blocks, axis=1)                    # [R, dnum, a, N1, n2]

        kernel = functools.partial(_fused_kernel, alpha=alpha)
        acc2, acc1 = pl.pallas_call(
            kernel,
            grid=(R_, T, dnum),
            in_specs=[
                pl.BlockSpec((None, None, alpha, N1, n2),
                             lambda r, t, j: (r, j, 0, 0, 0)),
                pl.BlockSpec((None, None, 1, alpha),
                             lambda r, t, j: (j, t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, _NDIG, N1, N1),
                             lambda r, t, j: (t, 0, 0, 0)),
                pl.BlockSpec((None, _NDIG, n2, n2),
                             lambda r, t, j: (t, 0, 0, 0)),
                pl.BlockSpec((None, N1, n2), lambda r, t, j: (t, 0, 0)),
                pl.BlockSpec((None, N1, n2), lambda r, t, j: (t, 0, 0)),
                pl.BlockSpec((None, None, n2, N1),
                             lambda r, t, j: (j, t, 0, 0)),
                pl.BlockSpec((None, None, n2, N1),
                             lambda r, t, j: (j, t, 0, 0)),
                pl.BlockSpec((None, 1, 8), lambda r, t, j: (t, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(pl.BlockSpec((None, None, n2, N1),
                                    lambda r, t, j: (r, t, 0, 0)),
                       pl.BlockSpec((None, None, n2, N1),
                                    lambda r, t, j: (r, t, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((R_, T, n2, N1), jnp.uint32),
                       jax.ShapeDtypeStruct((R_, T, n2, N1), jnp.uint32)),
            interpret=interpret,
        )(y4, jnp.asarray(self.cst.reshape(dnum, T, 1, alpha)),
          jnp.asarray(self.mt.w1), jnp.asarray(self.mt.w2),
          jnp.asarray(self.mt.tw), jnp.asarray(self.psi),
          jnp.asarray(self.km), jnp.asarray(self.kd),
          jnp.asarray(self.sc))
        return (acc1.reshape(lead + (T, n)), acc2.reshape(lead + (T, n)))
