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

    def hybrid_key_limbs(self, exp_ring: RingContext) -> List[int]:
        """Positions of the expanded tower's limbs inside the key ring."""
        lt = exp_ring.nlimbs - self.num_special
        return list(range(lt)) + list(range(self.L, self.L + self.num_special))

    def hybrid_contract(self, ring: RingContext, a: RingElt
                        ) -> Tuple[RingContext, RingElt]:
        """Divide the accumulator by P: num_special rounding rescales
        (crt.jl:215-220 semantics, applied k times). BGV bases use the
        p-adapted rounding (ring.rescale_adapted) so the error stays
        ≡ 0 mod p; P cancels fully, leaving no message factor."""
        from . import rlwe
        t = rlwe.bgv_plain_modulus(self)
        for _ in range(self.num_special):
            ring, a = (R.rescale_adapted(ring, a, t) if t is not None
                       else R.rescale(ring, a))
        return ring, a
