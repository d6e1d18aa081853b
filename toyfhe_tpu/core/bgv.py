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
from .rlwe import SchemeParams


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

    def encode(self, plaintext: PlainPoly) -> RingElt:
        m = np.asarray(plaintext.coeffs, dtype=np.uint32)[None, :]
        arr = jnp.broadcast_to(jnp.asarray(m), (self._ring.nlimbs, self._ring.n))
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
