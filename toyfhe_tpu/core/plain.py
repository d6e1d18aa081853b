"""Plaintext spaces and BFV/BGV encodings (layers L5 + plaintext half of L1).

Covers the reference's ``plaintext_space`` construction
(``/root/reference/src/rlwe_she.jl:374-392``), ``ScalarEncoding`` and the
NTT-based ``SlotEncoding`` (``/root/reference/src/encoding.jl``).

Plaintext polynomials are small host-side numpy arrays mod p; slot
packing runs the plaintext-field NTT on device through the same kernel
stack as the ciphertext rings.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops import ntt as nttmod
from ..utils import numtheory as nt


class PlainRing:
    """ℤp[x]/(x^N+1) plaintext ring (rlwe_she.jl:380-392).

    If p is prime and 2N | p−1, the ring supports N SIMD slots via its own
    negacyclic NTT (SlotEncoding requirement, encoding.jl:42-46).
    """

    def __init__(self, n: int, p: int):
        self.n = int(n)
        self.p = int(p)
        self.is_prime = nt.is_prime(self.p)
        self.has_slots = self.is_prime and (self.p - 1) % (2 * self.n) == 0 and self.p < (1 << 31)
        self._tables: Optional[nttmod.NttTables] = None

    @property
    def tables(self) -> nttmod.NttTables:
        if not self.has_slots:
            raise ValueError(f"p={self.p} does not support slot packing (need prime ≡ 1 mod 2N)")
        if self._tables is None:
            self._tables = nttmod.NttTables(self.n, [self.p])
        return self._tables

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def zero(self) -> "PlainPoly":
        return PlainPoly(self, np.zeros(self.n, dtype=np.int64))


@dataclasses.dataclass
class PlainPoly:
    """Plaintext polynomial: coefficients in [0, p)."""

    ring: PlainRing
    coeffs: np.ndarray      # int64[n]

    def __post_init__(self):
        self.coeffs = np.mod(np.asarray(self.coeffs, dtype=np.int64), self.ring.p)

    def __getitem__(self, i):
        return int(self.coeffs[i])

    def __setitem__(self, i, v):
        self.coeffs[i] = int(v) % self.ring.p

    def centered(self) -> np.ndarray:
        c = self.coeffs.copy()
        big = c > self.ring.p // 2
        c[big] -= self.ring.p
        return c

    def mul(self, other: "PlainPoly") -> "PlainPoly":
        """Host negacyclic product — test oracle (pow2_cyc_rings.jl:150-165)."""
        out = nttmod.naive_negacyclic_mul(self.coeffs, other.coeffs, self.ring.p)
        return PlainPoly(self.ring, out.astype(np.int64))


def scalar_encode(pring: PlainRing, value: int) -> PlainPoly:
    """ScalarEncoding: value in coefficient 0 (encoding.jl:5-29)."""
    z = pring.zero()
    z[0] = value
    return z


def scalar_decode(plain: PlainPoly) -> int:
    return plain[0]


def coeff_encode(pring: PlainRing, coeffs) -> PlainPoly:
    """Full coefficient-vector encoding — the reference tests' OffsetArray
    assignment form (``plain .= vec``)."""
    return PlainPoly(pring, np.asarray(coeffs, dtype=np.int64))


def slot_encode(pring: PlainRing, slots) -> PlainPoly:
    """SlotEncoding: slot values are the dual (NTT-domain) coefficients of
    the plaintext polynomial (encoding.jl:31-57) — encode = inverse NTT
    over 𝔽p."""
    t = pring.tables
    vals = np.mod(np.asarray(slots, dtype=np.int64), pring.p).astype(np.uint32)
    coeffs = np.asarray(nttmod.intt(t, jnp.asarray(vals[None, :])))[0]
    return PlainPoly(pring, coeffs.astype(np.int64))


def slot_decode(plain: PlainPoly) -> np.ndarray:
    """Slot view of a plaintext: forward NTT over 𝔽p."""
    t = plain.ring.tables
    vals = plain.coeffs.astype(np.uint32)
    return np.asarray(nttmod.ntt(t, jnp.asarray(vals[None, :])))[0].astype(np.int64)
