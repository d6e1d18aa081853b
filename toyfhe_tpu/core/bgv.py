"""BGV scheme (layer L4) — ``/root/reference/src/bgv.jl``.

Plaintext rides the low digits: π⁻¹ embeds m directly, noise is p·𝒩
(``ShiftedDiscreteNormal``, bgv.jl:27-33), π is the centered residue
mod p (bgv.jl:22-25).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import modmath, sampling
from ..utils import numtheory as nt
from . import ring as R
from .plain import PlainPoly, PlainRing
from .ring import RingContext, RingElt
from .rlwe import SchemeParams, UsageError
import dataclasses


@dataclasses.dataclass(frozen=True)
class BGVTag:
    """Leveled-BGV plaintext correction: rescaling by q_k multiplies the
    message by q_k⁻¹ mod p (standard BGV modulus switching — beyond the
    reference, which never modswitches BGV). ``mult`` accumulates the
    dropped primes mod p; decode multiplies the result back by it."""

    p: int
    mult: int = 1

    def rescale_by(self, q: int) -> "BGVTag":
        return BGVTag(self.p, self.mult * (int(q) % self.p) % self.p)

    def drop_limb(self, ring) -> "BGVTag":
        return self                     # drop without rescale: m unchanged

    def combine_mul(self, other: "BGVTag") -> "BGVTag":
        if self.p != other.p:
            raise UsageError("BGV plaintext modulus mismatch")
        return BGVTag(self.p, self.mult * other.mult % self.p)

    def combine_add(self, other: "BGVTag") -> "BGVTag":
        if (self.p, self.mult) != (other.p, other.mult):
            raise UsageError(
                "BGV level-factor mismatch on add: rescale both operands "
                "by the same primes first")
        return self

    def decode(self, params, dec: PlainPoly, ring) -> PlainPoly:
        return PlainPoly(dec.ring, dec.coeffs * self.mult % self.p)


class BGVParams(SchemeParams):
    def __init__(self, ring: RingContext, p: int, sigma: float,
                 relin_window: int = 0):
        self._ring = ring
        self.plain = PlainRing(ring.n, p)
        self.sigma = float(sigma)
        self.relin_window = relin_window

    @property
    def ring_cipher(self) -> RingContext:
        return self._ring

    def plaintext_space(self) -> PlainRing:
        return self.plain

    def scheme_name(self):
        return "BGV"

    def encode(self, plaintext: PlainPoly, ring: RingContext = None) -> RingElt:
        # ``ring``: target tower — a raising modifier encrypts at a
        # shorter tower than the base scheme's full ring (crt.jl:161-183)
        ring = ring if ring is not None else self._ring
        m = np.asarray(plaintext.coeffs, dtype=np.uint32)[None, :]
        arr = jnp.broadcast_to(jnp.asarray(m), (ring.nlimbs, ring.n))
        # coefficients are < p < every q_i, so embedding is the identity
        return RingElt(primal=arr.astype(jnp.uint32))

    def decode(self, b: RingElt, ring: RingContext) -> PlainPoly:
        b = R.ensure_primal(ring, b)
        arr = np.asarray(b.primal)
        p = self.plain.p
        nat = ring.native()
        if nat is not None:
            return PlainPoly(self.plain, nat.decode_centered_mod(arr, p))
        xs = ring.to_bigint(arr)
        q = ring.modulus
        out = np.array([nt.centered(x, q) % p for x in xs], dtype=np.int64)
        return PlainPoly(self.plain, out)

    def noise(self, key, ring: RingContext, batch=()):
        return RingElt(primal=sampling.discrete_gaussian(
            key, ring.mp, ring.n, self.sigma, batch, shift=self.plain.p))

    def secret_sampler(self, key, ring: RingContext, batch=()):
        return RingElt(primal=sampling.discrete_gaussian(
            key, ring.mp, ring.n, self.sigma, batch))
