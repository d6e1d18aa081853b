"""Fused Pallas key-switch kernel (hybrid gadget, special prime).

The XLA key-switch materializes the digit tensor — ndig × Le ring rows —
in HBM and round-trips it through the batched NTT, the key contraction
and the inverse transform. This kernel computes, per output limb, the
whole chain in VMEM:

    digits (shift/mask of c2 primal)  →  forward NTT (DIF, bit-reversed)
    →  Σ_digits key[d]·digit[d]       →  inverse NTT (DIT)  →  primal out

Grid = output limbs of the expanded tower; each cell reads the full c2
primal block (small), its own limb's twiddles and key rows, and writes
one primal row pair. The digit tensor never exists in HBM.

Bit-reversed dual ordering is kernel-internal (as in ops/ntt_pallas.py):
key duals and the expanded c1 component are pre-permuted host/XLA-side.
Supports window > 0 gadgets (digit values < 2^w need no modular
reduction — the reason the hybrid gadget is the TPU-native default).
The final cross-limb rescale stays outside (it needs the dropped limb
on every row).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .ntt import NttTables, _bitrev_perm
from .ntt_pallas import (PallasNttTables, _dif_stages, _dit_stages, _mm,
                         _add, HAVE_PALLAS)

if HAVE_PALLAS:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _ks_kernel(c2_ref, c1e_ref, masks_ref, maskeds_ref, fwd_ref, inv_ref,
               psi_ref, ipsi_ref, pn_ref, out1_ref, out2_ref, buf,
               *, logn, n, window, kpl, Lc):
    p = pn_ref[0, 0]
    ninv = pn_ref[0, 1]
    lane = jax.lax.broadcasted_iota(jnp.uint32, (Lc * kpl, n), 1)
    psi = psi_ref[0, :]
    ipsi = ipsi_ref[0, :]

    # digits: (Lc, N) -> (Lc*kpl, N) base-2^w rows (values < 2^w < p);
    # shifts are Python constants so nothing is captured
    mask = np.uint32((1 << window) - 1)
    c2 = c2_ref[...]
    rows = [(c2 >> np.uint32(window * k)) & mask for k in range(kpl)]
    d = jnp.stack(rows, axis=1)                             # (Lc, kpl, N)
    digs = d.reshape(Lc * kpl, n)

    # forward negacyclic NTT of every digit row (bit-reversed out)
    buf[...] = _mm(digs, psi, p, ninv)
    digd = _dif_stages(buf[...], fwd_ref, lane, p, ninv, logn, n, buf)

    # contraction with this limb's key rows (keys are plain residues, so
    # convert the digit duals to Montgomery form once: a·b = REDC(ã·b))
    digd_m = _mm(digd, pn_ref[0, 2], p, ninv)
    acc1 = _mm(digd_m, maskeds_ref[...], p, ninv)
    acc2 = _mm(digd_m, masks_ref[...], p, ninv)
    # tree-reduce over the digit axis
    r1 = _tree_sum(acc1, p)
    r2 = _tree_sum(acc2, p)
    r1 = _add(r1, c1e_ref[...], p)

    # inverse transforms back to primal (natural order)
    lane1 = jax.lax.broadcasted_iota(jnp.uint32, (1, n), 1)
    x1 = _dit_stages(r1, inv_ref, lane1, p, ninv, logn, n)
    x2 = _dit_stages(r2, inv_ref, lane1, p, ninv, logn, n)
    out1_ref[...] = _mm(x1, ipsi, p, ninv)
    out2_ref[...] = _mm(x2, ipsi, p, ninv)


def _tree_sum(x, p):
    k = x.shape[0]
    while k > 1:
        half = k // 2
        red = _add(x[:half], x[half:2 * half], p)
        if k % 2:
            red = jnp.concatenate([red, x[2 * half:]], axis=0)
        x = red
        k = x.shape[0]
    return x[:1]


class FusedKeyswitch:
    """Host wrapper: precomputes bit-reversed key/twiddle tables for the
    expanded tower and exposes a jitted fused keyswitch.

    Inputs per call: c2p (Lc, N) primal, c1e_dual_brev (Le, N) — the
    expanded first component's dual, already bit-reverse-permuted.
    Returns primal (Le, N) components (caller rescales by the special
    prime).
    """

    def __init__(self, exp_tables: NttTables, masks_dual, maskeds_dual,
                 window: int, kpl: int, Lc: int):
        assert window > 0, "fused kernel supports windowed gadgets"
        self.pt = PallasNttTables(exp_tables)
        self.window, self.kpl, self.Lc = window, kpl, Lc
        self.n = exp_tables.n
        self.logn = self.n.bit_length() - 1
        brev = _bitrev_perm(self.n)
        self.brev = brev
        # keys: (ndig, Le, N) natural dual -> bit-reversed dual
        self.masks = jnp.asarray(np.asarray(masks_dual)[:, :, brev])
        self.maskeds = jnp.asarray(np.asarray(maskeds_dual)[:, :, brev])
        pn = np.stack([self.pt.p, self.pt.ninv, self.pt.r2], axis=1
                      ).astype(np.uint32)[:, None, :]
        self._pn = pn
        self._fn = jax.jit(lambda a, b: self._call(a, b, False))

    def __call__(self, c2p, c1e_dual_brev, interpret: bool = False):
        if interpret:
            return self._call(c2p, c1e_dual_brev, True)
        return self._fn(c2p, c1e_dual_brev)

    def _call(self, c2p, c1e_dual_brev, interpret: bool = False):
        n, logn = self.n, self.logn
        Le = self.Lc + 1
        ndig = self.Lc * self.kpl
        kernel = functools.partial(_ks_kernel, logn=logn, n=n,
                                   window=self.window, kpl=self.kpl,
                                   Lc=self.Lc)
        out1, out2 = pl.pallas_call(
            kernel,
            grid=(Le,),
            in_specs=[
                pl.BlockSpec((self.Lc, n), lambda j: (0, 0)),
                pl.BlockSpec((None, 1, n), lambda j: (j, 0, 0)),
                pl.BlockSpec((None, ndig, n),
                             lambda j: (j, 0, 0)),
                pl.BlockSpec((None, ndig, n),
                             lambda j: (j, 0, 0)),
                pl.BlockSpec((None, logn, n), lambda j: (j, 0, 0)),
                pl.BlockSpec((None, logn, n), lambda j: (j, 0, 0)),
                pl.BlockSpec((None, 1, n), lambda j: (j, 0, 0)),
                pl.BlockSpec((None, 1, n), lambda j: (j, 0, 0)),
                pl.BlockSpec((None, 1, 3), lambda j: (j, 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=(pl.BlockSpec((None, 1, n), lambda j: (j, 0, 0)),
                       pl.BlockSpec((None, 1, n), lambda j: (j, 0, 0))),
            out_shape=(jax.ShapeDtypeStruct((Le, 1, n), jnp.uint32),
                       jax.ShapeDtypeStruct((Le, 1, n), jnp.uint32)),
            scratch_shapes=[pltpu.VMEM((ndig, n), jnp.uint32)],
            interpret=interpret,
        )(c2p, c1e_dual_brev[:, None, :],
          jnp.swapaxes(self.masks, 0, 1), jnp.swapaxes(self.maskeds, 0, 1),
          jnp.asarray(self.pt.fwd), jnp.asarray(self.pt.inv),
          jnp.asarray(self.pt.psi_pow), jnp.asarray(self.pt.psi_ipow),
          jnp.asarray(self._pn))
        return out1[:, 0, :], out2[:, 0, :]
