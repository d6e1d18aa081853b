"""Exact RNS machinery for BFV multiplication (BEHZ-style).

TPU-native replacement for the reference's big-ring multiply
(``/root/reference/src/bfv.jl:34-40``): instead of modulus-switching every
ciphertext component into a fresh double-width prime field
(``bfv.jl:202-226``) — impossible with 32-bit limbs — the tensor product is
computed simultaneously in the ciphertext base q and an auxiliary base
Bsk = B ∪ {m_sk}, with integer-only exact base conversions:

  * SmMRq (small Montgomery reduction mod q via an extra modulus
    m̃ = 2^16) converts each input component q → Bsk **exactly** on the
    centered representative;
  * the t/q scale-and-round (``multround``/``divround`` semantics,
    ``bfv.jl:172-200``) becomes add-⌊q/2⌋ then an RNS floor
    (w − [w]_q)·q^{-1}, whose fast q→Bsk conversion errs by at most
    α ∈ [0, L) — absorbed as negligible additive noise;
  * Shenoy–Kumaresan conversion (using m_sk) brings the result back to
    base q exactly.

Every step is uint32 Montgomery arithmetic on dense ``[..., L, N]``
tensors — no floating point, no wide integers, fully jittable.

Reference for the algorithm (public): Bajard–Eynard–Hasan–Zucca, "A Full
RNS Variant of FV-like Somewhat Homomorphic Encryption Schemes", SAC 2016.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import modmath
from ..ops.modmath import MontParams
from . import ring as R
from .ring import RingContext, RingElt

_MTILDE_BITS = 16
_MTILDE = 1 << _MTILDE_BITS
_MT_MASK = np.uint32(_MTILDE - 1)


def _mont_col(vals, ps) -> np.ndarray:
    """Column of constants in Montgomery form wrt per-row primes ps."""
    return np.array([[int(v) * (1 << 32) % p] for v, p in zip(vals, ps)],
                    dtype=np.uint64).astype(np.uint32)


class BFVMulContext:
    """Precomputed tables for one (q-ring, aux-ring) pair.

    ``aux_ring`` holds B ∪ {m_sk}: the last aux limb plays the m_sk role.
    ``ext_ring`` is the concatenated q ∪ B ∪ {m_sk} tower the tensor
    product runs in (the TPU-shaped stand-in for the reference ℛbig).
    """

    def __init__(self, ring: RingContext, aux_ring: RingContext):
        self.ring = ring
        self.aux = aux_ring
        qs = ring.primes
        bsk = aux_ring.primes
        bs, msk = bsk[:-1], bsk[-1]
        self.ext_ring = RingContext(ring.n, qs + bsk,
                                    ring.psis + aux_ring.psis)
        L, J = len(qs), len(bsk)
        q = math.prod(qs)
        B = math.prod(bs)

        # ---- q -> Bsk fast base conversion tables ----
        qhat = [q // qi for qi in qs]
        self.qhat_inv_mont_q = _mont_col([pow(h % p, -1, p) for h, p in zip(qhat, qs)], qs)
        # (J, L, 1) Montgomery constants [q/q_i mod bsk_j]
        self.qhat_mont_bsk = np.stack([
            _mont_col([h % pj for h in qhat], [pj] * L) for pj in bsk], axis=0)
        self.mp_bsk = aux_ring.mp
        self.mp_bsk3 = aux_ring.mp.expand()

        # ---- SmMRq (m_tilde) tables ----
        self.mtilde_mont_q = _mont_col([_MTILDE % qi for qi in qs], qs)  # multiply-by-m̃

        self.qhat_mod_mtilde = np.array(
            [[h % _MTILDE] for h in qhat], dtype=np.uint32)       # (L, 1)
        self.neg_qinv_mtilde = np.uint32((-pow(q % _MTILDE, -1, _MTILDE)) % _MTILDE)
        self.q_mont_bsk = _mont_col([q % pj for pj in bsk], bsk)
        self.mtilde_inv_mont_bsk = _mont_col(
            [pow(_MTILDE % pj, -1, pj) for pj in bsk], bsk)

        # ---- t/q floor tables ----
        self.qinv_mont_bsk = _mont_col([pow(q % pj, -1, pj) for pj in bsk], bsk)
        qhalf = (q - 1) // 2
        self.qhalf_res_q = ring.scalar_residues(qhalf)
        self.qhalf_res_bsk = aux_ring.scalar_residues(qhalf)

        # ---- Shenoy–Kumaresan B -> q tables ----
        bhat = [B // bi for bi in bs]
        self.bhat_inv_mont_b = _mont_col(
            [pow(h % p, -1, p) for h, p in zip(bhat, bs)], bs)
        self.bhat_mont_q = np.stack([
            _mont_col([h % pj for h in bhat], [pj] * len(bs)) for pj in qs], axis=0)
        self.bhat_mont_msk = _mont_col([h % msk for h in bhat], [msk] * len(bs))  # (Lb,1)
        self.binv_mont_msk = _mont_col([pow(B % msk, -1, msk)], [msk])            # (1,1)
        self.b_res_q = ring.scalar_residues(B % q)
        self.mp_msk = aux_ring.mp.select([J - 1])
        self.mp_b = aux_ring.mp.select(list(range(J - 1)))
        self.mp_q3 = ring.mp.expand()
        self.msk = msk

    # ------------------------------------------------------------------
    def _contract(self, y, consts, mp_target3, mp_target):
        """out_j = Σ_i y_i · consts[j,i] mod p_j.

        y: (..., L, N); consts: (J, L, 1) Montgomery; returns (..., J, N).
        Raw y may exceed p_j — safe because REDC only needs b < p.
        """
        prod = modmath.mont_mul(y[..., None, :, :], jnp.asarray(consts), mp_target3)
        return modmath.mod_sum(prod, mp_target, axis=-2)

    def smmrq_convert(self, xq):
        """Exact centered conversion q -> Bsk of uint32[..., L, N] (SmMRq)."""
        mpq = self.ring.mp
        xm = modmath.mont_mul(xq, jnp.asarray(self.mtilde_mont_q), mpq)   # m̃·x mod q
        y = modmath.mont_mul(xm, jnp.asarray(self.qhat_inv_mont_q), mpq)  # [x̃_i (q/q_i)^{-1}]_{q_i}
        conv_bsk = self._contract(y, self.qhat_mont_bsk, self.mp_bsk3, self.mp_bsk)
        # m̃-channel: everything mod 2^16 rides plain uint32 wraparound
        conv_mt = jnp.sum(
            (y & _MT_MASK) * jnp.asarray(self.qhat_mod_mtilde), axis=-2) & _MT_MASK
        r = (conv_mt * self.neg_qinv_mtilde) & _MT_MASK
        r_c = jnp.where(r >= _MTILDE // 2, r.astype(jnp.int32) - _MTILDE,
                        r.astype(jnp.int32))[..., None, :]
        rq = modmath.mont_mul(
            modmath.from_signed(jnp.broadcast_to(r_c, conv_bsk.shape), self.mp_bsk),
            jnp.asarray(self.q_mont_bsk), self.mp_bsk)
        tot = modmath.add_mod(conv_bsk, rq, self.mp_bsk)
        return modmath.mont_mul(tot, jnp.asarray(self.mtilde_inv_mont_bsk), self.mp_bsk)

    def fbc_q_to_bsk(self, xq):
        """Plain fast base conversion (errs by +αq, α ∈ [0, L))."""
        y = modmath.mont_mul(xq, jnp.asarray(self.qhat_inv_mont_q), self.ring.mp)
        return self._contract(y, self.qhat_mont_bsk, self.mp_bsk3, self.mp_bsk)

    def rns_floor(self, wq, wbsk):
        """floor(w/q) in base Bsk given w's residues in both bases."""
        conv = self.fbc_q_to_bsk(wq)
        diff = modmath.sub_mod(wbsk, conv, self.mp_bsk)
        return modmath.mont_mul(diff, jnp.asarray(self.qinv_mont_bsk), self.mp_bsk)

    def sk_convert(self, ybsk):
        """Exact Shenoy–Kumaresan conversion Bsk -> q of uint32[..., J, N]."""
        yb = ybsk[..., :-1, :]
        ymsk = ybsk[..., -1:, :]
        z = modmath.mont_mul(yb, jnp.asarray(self.bhat_inv_mont_b), self.mp_b)
        conv_msk = self._contract(z, self.bhat_mont_msk[None, ...],
                                  self.mp_msk.expand(), self.mp_msk)
        alpha = modmath.mont_mul(
            modmath.sub_mod(conv_msk, ymsk, self.mp_msk),
            jnp.asarray(self.binv_mont_msk), self.mp_msk)
        alpha_c = modmath.centered(alpha, self.mp_msk)                    # (..., 1, N)
        out = self._contract(z, self.bhat_mont_q, self.mp_q3, self.ring.mp)
        corr = modmath.mont_mul(
            modmath.from_signed(jnp.broadcast_to(alpha_c, out.shape), self.ring.mp),
            jnp.asarray(_mont_col([int(x) for x in self.b_res_q.ravel()],
                                  self.ring.primes)), self.ring.mp)
        return modmath.sub_mod(out, corr, self.ring.mp)

    # ------------------------------------------------------------------
    # scheme hooks
    # ------------------------------------------------------------------
    def expand_component(self, x: RingElt) -> RingElt:
        """ct component at base q -> element of the q ∪ Bsk ext ring."""
        x = R.ensure_primal(self.ring, x)
        xb = self.smmrq_convert(x.primal)
        return RingElt(primal=jnp.concatenate([x.primal, xb], axis=-2))

    def contract_component(self, w: RingElt, t: int) -> RingElt:
        """round(t·w/q) brought back to base q."""
        w = R.ensure_primal(self.ext_ring, w)
        L = self.ring.nlimbs
        wq, wbsk = w.primal[..., :L, :], w.primal[..., L:, :]
        t_q = self.ring.scalar_residues(t)
        t_bsk = self.aux.scalar_residues(t)
        wq = modmath.mul_mod(wq, jnp.asarray(t_q), self.ring.mp)
        wbsk = modmath.mul_mod(wbsk, jnp.asarray(t_bsk), self.mp_bsk)
        wq = modmath.add_mod(wq, jnp.asarray(self.qhalf_res_q), self.ring.mp)
        wbsk = modmath.add_mod(wbsk, jnp.asarray(self.qhalf_res_bsk), self.mp_bsk)
        floor_bsk = self.rns_floor(wq, wbsk)
        return RingElt(primal=self.sk_convert(floor_bsk))


def make_aux_ring(ring: RingContext, extra_bits: int = 0) -> RingContext:
    """Auxiliary base B ∪ {m_sk} with L+1 ~30-bit limbs continuing the
    prime walk past the ciphertext tower (like test/bfv_crt.jl:18-27)."""
    from ..utils import numtheory as nt

    n = ring.n
    primes = []
    last = max(ring.primes)
    want = ring.nlimbs + 1 + (extra_bits + 29) // 30
    while len(primes) < want + 1:   # +1 for m_sk
        last = nt.next_prime(last + 2 * n, interval=2 * n)
        primes.append(last)
    return RingContext(n, primes)
