"""dnum-grouped hybrid key-switching (the production "dnum" gadget).

The reference's two decompositions (``rlwe_she.jl:327-338``) are
per-limb RNS digits or per-bit windows — the digit count, and with it
key-switch cost and key size, scales with the tower depth L. The
production gadget (SEAL/Lattigo "dnum") partitions the tower into
``dnum`` GROUPS of α = ⌈L/dnum⌉ limbs:

  * digit j = the group-j residue, fast-base-converted **on device**
    into the full Q_t ∪ P accumulation tower (P = product of
    ``num_special`` raising primes, which must carry ≳ α limbs' worth
    of bits so the α·Q_j-sized digits divide away);
  * key component j encrypts P·ĝ_j·old at modulus Q·P, with
    ĝ_j = (Q/Q_j)·[(Q/Q_j)⁻¹]_{Q_j} — the factor is ≡ 1 on group-j
    limbs and ≡ 0 elsewhere, so the keys remain valid at EVERY tower
    level without regeneration (drops only shrink the last group);
  * contraction divides the accumulator by each special prime in turn
    (``num_special`` rounding rescales), then the untouched base
    components are added — unlike ``ModulusRaised``, the ciphertext is
    never pre-scaled by P.

Cost per key-switch: ``dnum`` digit NTT batches over Lt+k limbs instead
of Lt batches — an ~α× reduction in the dominant transform work for
deep towers — and keys shrink by the same factor.

Fast base conversion is the plain (uncorrected) FBC: the lift
D_j = Σ_i y_i·(Q_j/q_i) with y ∈ [0, q_i) equals x mod Q_j plus a
multiple u·Q_j, u ∈ [0, α) — absorbed by P exactly as in BEHZ
(``core/behz.py``), whose contraction kernel this reuses.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import modmath
from . import ring as R
from .ring import RingContext, RingElt
from .rlwe import PassthroughParams, PubKey, CipherText
from .behz import _mont_col


class HybridRaised(PassthroughParams):
    """Scheme modifier: the last ``num_special`` CRT primes are raising
    primes; key-switch digits are ``dnum`` limb groups (α = ⌈L/dnum⌉).

    ``dnum = L, num_special = 1`` degenerates to per-limb digits with
    one special prime (≈ ``ModulusRaised`` with relin_window = 0, minus
    the ciphertext pre-scaling)."""

    def __init__(self, params, dnum: int, num_special: int):
        super().__init__(params)
        full = params.ring_cipher
        if num_special < 1 or num_special >= full.nlimbs:
            raise ValueError("num_special out of range")
        self.num_special = int(num_special)
        self.L = full.nlimbs - self.num_special        # ct tower depth
        if not (1 <= dnum <= self.L):
            raise ValueError("dnum out of range")
        self.dnum = int(dnum)
        self.alpha = -(-self.L // self.dnum)
        spec = full.primes[self.L:]
        self.P = math.prod(spec)
        # the α·Q_j digit bound must divide away under P
        qmax = math.prod(full.primes[:self.alpha])     # largest group
        if self.P < self.alpha * qmax:
            raise ValueError(
                f"special primes too small: P={self.P:.3e} < "
                f"alpha*Q_group={self.alpha * qmax:.3e}; add or widen the "
                f"raising primes")
        self._fbc_cache = {}

    @property
    def ring_cipher(self) -> RingContext:
        full = self.params.ring_cipher
        return full.select(list(range(self.L)))

    @property
    def ring_key(self) -> RingContext:
        return self.params.ring_cipher

    # --- keygen hooks ---------------------------------------------------

    def hybrid_factors(self) -> List[int]:
        """P·ĝ_j mod (Q·P), one per group, over the FULL tower."""
        full = self.params.ring_cipher
        qp = full.modulus
        qs = full.primes[:self.L]
        out = []
        for j in range(self.dnum):
            grp = qs[j * self.alpha:(j + 1) * self.alpha]
            qj = math.prod(grp)
            qhat = math.prod(qs) // qj
            g = qhat * pow(qhat % qj, -1, qj)
            out.append(self.P * g % qp)
        return out

    def encrypt_zero(self, pub: PubKey, rng) -> CipherText:
        """Encrypt at the full tower, then drop the raising limbs
        (modulusraising.jl:23-26 generalized to k specials)."""
        from . import rlwe
        full = self.params.ring_cipher
        c = rlwe._encrypt_zero_at(self, full, pub.key, rng)
        cs = []
        sub = None
        for x in c.cs:
            ring = full
            for _ in range(self.num_special):
                ring, x = R.modswitch_drop(ring, x)
            sub = ring
            cs.append(x)
        return CipherText(self, tuple(cs), sub)

    # --- key-switch hooks -------------------------------------------------

    def _tables(self, lt: int):
        """Per-tower-length FBC tables: for each group j surviving at
        Lt limbs, (limb slice, ŷ-premultipliers, contraction constants
        into the Lt+k target)."""
        if lt in self._fbc_cache:
            return self._fbc_cache[lt]
        full = self.params.ring_cipher
        exp_ring = full.select(
            list(range(lt)) + list(range(self.L, self.L + self.num_special)))
        tgt = exp_ring.primes
        groups = []
        for j in range(self.dnum):
            lo = j * self.alpha
            hi = min((j + 1) * self.alpha, lt)
            if lo >= hi:
                break
            grp = full.primes[lo:hi]
            qj = math.prod(grp)
            qhat = [qj // qi for qi in grp]
            inv = _mont_col([pow(h % p, -1, p) for h, p in zip(qhat, grp)],
                            grp)
            consts = np.stack(
                [_mont_col([h % pt for h in qhat], [pt] * len(grp))
                 for pt in tgt], axis=0)                      # (T, a, 1)
            groups.append(((lo, hi), inv, consts))
        self._fbc_cache[lt] = (exp_ring, groups)
        return self._fbc_cache[lt]

    def hybrid_decompose(self, ring: RingContext, x: RingElt
                         ) -> Tuple[RingContext, jnp.ndarray]:
        """x (primal, Lt limbs) → digit tensor uint32[dnum_t, Lt+k, N]:
        each group residue fast-base-converted to the full target."""
        lt = ring.nlimbs
        exp_ring, groups = self._tables(lt)
        xp = R.ensure_primal(ring, x).primal                  # [..., Lt, N]
        mp3 = exp_ring.mp.expand()
        digs = []
        for (lo, hi), inv, consts in groups:
            xi = xp[..., lo:hi, :]
            y = modmath.mont_mul(xi, jnp.asarray(inv), ring.mp.select(
                list(range(lo, hi))))
            prod = modmath.mont_mul(y[..., None, :, :], jnp.asarray(consts),
                                    mp3)
            digs.append(modmath.mod_sum(prod, exp_ring.mp, axis=-2))
        return exp_ring, jnp.stack(digs, axis=0)

    def hybrid_decompose_dual(self, ring: RingContext, x: RingElt
                              ) -> Tuple[RingContext, jnp.ndarray]:
        """Digit tensor in the expanded tower's DUAL domain, NTTing only
        the out-of-group rows: digit j satisfies D_j ≡ x (mod q_i) for
        every i in group j exactly (the FBC term collapses to
        x_i·ŷ_i^{-1}·ŷ_i = x_i), so those dual rows are x's own dual
        rows — already in hand. Saves Lt of the dnum·(Lt+k) digit
        transforms, bit-exactly."""
        from ..ops import ntt as nttmod
        from ..utils import metrics
        lt = ring.nlimbs
        exp_ring, digits = self.hybrid_decompose(ring, x)  # [ndig, ..., T, N]
        xd = R.ensure_dual(ring, x).dual                   # [..., Lt, N]
        T = exp_ring.nlimbs
        rows = []
        for j in range(digits.shape[0]):
            lo, hi = j * self.alpha, min((j + 1) * self.alpha, lt)
            out_idx = list(range(lo)) + list(range(hi, T))
            sub = exp_ring.select(out_idx)
            res = nttmod.ntt(sub.tables,
                             jnp.take(digits[j], jnp.asarray(out_idx),
                                      axis=-2))
            metrics.count("ntt_limb_transform",
                          int(np.prod(res.shape[:-1])))
            rows.append(jnp.concatenate(
                [res[..., :lo, :], xd[..., lo:hi, :], res[..., lo:, :]],
                axis=-2))
        return exp_ring, jnp.stack(rows, axis=0)

    def hybrid_key_limbs(self, exp_ring: RingContext) -> List[int]:
        """Positions of the expanded tower's limbs inside the key ring."""
        lt = exp_ring.nlimbs - self.num_special
        return list(range(lt)) + list(range(self.L, self.L + self.num_special))

    def hybrid_contract(self, ring: RingContext, a: RingElt
                        ) -> Tuple[RingContext, RingElt]:
        """Divide the accumulator by P: num_special rounding rescales
        (crt.jl:215-220 semantics, applied k times). BGV bases use the
        p-adapted rounding (ring.rescale_adapted) so the error stays
        ≡ 0 mod p; P cancels fully, leaving no message factor.

        Dual-domain accumulators (the key-switch hot path) take the
        FUSED ModDown: bit-identical to the sequential chain but paying
        INTT only for the k special rows and ONE ct-tower NTT for the
        combined correction, instead of a full expanded-tower INTT plus
        a re-NTT on the subsequent add (round-2 VERDICT item 2)."""
        from . import rlwe
        t = rlwe.bgv_plain_modulus(self)
        if t is None and a.dual is not None and a.primal is None:
            return self.hybrid_contract_fused(ring, a)
        for _ in range(self.num_special):
            ring, a = (R.rescale_adapted(ring, a, t) if t is not None
                       else R.rescale(ring, a))
        return ring, a

    def _fused_tables(self, exp_ring: RingContext):
        """Cached fold constants for ``hybrid_contract_fused`` at this
        expanded tower: unrolling the k sequential raw-residue rescales
        (R.rescale drops the LAST limb each time) gives, mod each
        surviving ct prime q_i,

          b ≡ a·P^{-1} − Σ_{s=1..k} l_s·(p_{k-s}···p_0)^{-1}   (mod q_i)

        where l_s is the raw residue of the step-s accumulator mod the
        prime dropped at step s — computable from the k special PRIMAL
        rows alone. All weights are stored in Montgomery column form."""
        key = ("fused", exp_ring)
        if key in self._fbc_cache:
            return self._fbc_cache[key]
        k = self.num_special
        lt = exp_ring.nlimbs - k
        ct_ring = exp_ring.select(range(lt))
        sp_ring = exp_ring.select(range(lt, lt + k))
        spp = sp_ring.primes                          # [p_0 .. p_{k-1}]
        # cache HOST numpy columns: a jnp array created inside one jit
        # trace is a tracer constant — caching it leaks into later traces
        mcol = lambda vals, ps: np.array(
            [[int(v) * (1 << 32) % p] for v, p in zip(vals, ps)],
            dtype=np.uint64).astype(np.uint32)
        pinv = mcol([pow(self.P % p, -1, p) for p in ct_ring.primes],
                    ct_ring.primes)
        # step-s weight: (∏_{t=0..k-s} p_t)^{-1} mod q_i  (s = 1..k)
        wts = []
        for s in range(1, k + 1):
            prod = math.prod(spp[: k - s + 1])
            wts.append(mcol([pow(prod % p, -1, p) for p in ct_ring.primes],
                            ct_ring.primes))
        # special-row update constants: at step s the dropped prime is
        # d_s = p_{k-s}; remaining rows p_0..p_{k-s-1} divide by d_s
        dinvs = []
        for s in range(1, k):
            d = spp[k - s]
            rem = spp[: k - s]
            dinvs.append(mcol([pow(d % p, -1, p) for p in rem], rem))
        self._fbc_cache[key] = (ct_ring, sp_ring, pinv, tuple(wts),
                                tuple(dinvs))
        return self._fbc_cache[key]

    def hybrid_contract_fused(self, exp_ring: RingContext, a: RingElt
                              ) -> Tuple[RingContext, RingElt]:
        """Fused ModDown of a dual-domain accumulator [..., Lt+k, N]:
        bit-identical to ``num_special`` sequential :func:`ring.rescale`
        calls (NTT is linear and exact, so NTT(b) = a_dual·P^{-1} −
        NTT(C) with C the combined correction polynomial)."""
        from ..ops import ntt as nttmod
        from ..utils import metrics
        k = self.num_special
        lt = exp_ring.nlimbs - k
        ct_ring, sp_ring, pinv, wts, dinvs = self._fused_tables(exp_ring)
        dual = a.dual
        sp = nttmod.intt(sp_ring.tables, dual[..., lt:, :])   # [..., k, N]
        metrics.count("ntt_limb_transform",
                      int(np.prod(sp.shape[:-1])))
        mp_ct = ct_ring.mp
        corr = None
        for s in range(k):
            l = sp[..., -1:, :]                   # raw residue row, [.., 1, N]
            sp = sp[..., :-1, :]
            if sp.shape[-2]:
                mp_rem = sp_ring.mp.select(list(range(sp.shape[-2])))
                lm = modmath.umod(l, mp_rem.p)
                sp = modmath.mont_mul(
                    modmath.sub_mod(sp, lm, mp_rem), dinvs[s], mp_rem)
            term = modmath.mont_mul(modmath.umod(l, mp_ct.p), wts[s], mp_ct)
            corr = term if corr is None else modmath.add_mod(corr, term,
                                                             mp_ct)
        corr_dual = nttmod.ntt(ct_ring.tables, corr)
        metrics.count("ntt_limb_transform", int(np.prod(corr.shape[:-1])))
        out = modmath.sub_mod(
            modmath.mont_mul(dual[..., :lt, :], pinv, mp_ct),
            corr_dual, mp_ct)
        return ct_ring, RingElt(dual=out)
