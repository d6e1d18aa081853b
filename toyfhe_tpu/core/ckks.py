"""CKKS scheme (layer L4) — ``/root/reference/src/ckks.jl``.

π is the identity (noise lives in the value, ckks.jl:21-22); the encoder
(core/ckks_encoding.py) handles ℂ^{N/2} ↔ ring conversion. The reference's
type-level ``FixedRational`` scale algebra (ckks.jl:35-92) becomes a
``fractions.Fraction`` tracked as static ciphertext metadata — it only
changes at multiply/rescale, which are Python-level structure changes, so
nothing dynamic enters jit.
"""

from __future__ import annotations

import math

from ..ops import sampling
from .ring import RingContext, RingElt
from .rlwe import SchemeParams

DEFAULT_SIGMA = 8.0 / math.sqrt(2.0 * math.pi)


class CKKSParams(SchemeParams):
    def __init__(self, ring: RingContext, relin_window: int = 0,
                 sigma: float = DEFAULT_SIGMA, secret: str = "gaussian",
                 hamming_weight: int = 0):
        """``secret="sparse"`` draws 𝒢 as a sparse ternary with
        ``hamming_weight`` nonzero ±1 coefficients — required for
        bootstrapping, where ‖s‖₁ bounds the ModRaise overflow K."""
        self._ring = ring
        self.relin_window = relin_window
        self.sigma = float(sigma)
        if secret not in ("gaussian", "sparse"):
            raise ValueError(f"unknown secret distribution {secret!r}")
        if secret == "sparse" and hamming_weight <= 0:
            raise ValueError("sparse secret requires hamming_weight > 0")
        self.secret = secret
        self.hamming_weight = int(hamming_weight)

    @property
    def ring_cipher(self) -> RingContext:
        return self._ring

    def plaintext_space(self) -> RingContext:
        # From the RLWE perspective plain == cipher ring (ckks.jl:17-19)
        return self._ring

    def scheme_name(self):
        return "CKKS"

    def encode(self, plaintext: RingElt, ring=None) -> RingElt:
        return plaintext               # π⁻¹ = identity (ckks.jl:21)

    def decode(self, b: RingElt, ring: RingContext) -> RingElt:
        return b                       # π = identity (ckks.jl:22)

    def noise(self, key, ring: RingContext, batch=()):
        return RingElt(primal=sampling.discrete_gaussian(
            key, ring.mp, ring.n, self.sigma, batch))

    def secret_sampler(self, key, ring: RingContext, batch=()):
        if self.secret == "sparse":
            return RingElt(primal=sampling.sparse_ternary(
                key, ring.mp, ring.n, self.hamming_weight, batch))
        return RingElt(primal=sampling.discrete_gaussian(
            key, ring.mp, ring.n, self.sigma, batch))
