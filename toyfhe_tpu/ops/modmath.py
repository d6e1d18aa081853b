"""Vectorized 32-bit modular arithmetic — the scalar layer (L0) on device.

TPU-native replacement for the reference's GaloisFields.jl prime-field
scalars, ``SignedMod`` centered representatives
(``/root/reference/src/signedmod.jl``) and BitIntegers wide-int arithmetic
(``/root/reference/src/bfv.jl:101-107``).

TPUs have no native 64-bit integer multiply-high, so every residue lives in
a ``uint32`` with its prime p < 2^31 and products are assembled from
16x16->32 partial products on the VPU. Wide dynamic range is recovered by
RNS towers (more limbs) instead of wider scalars — see core/rns.py.

All functions broadcast: coefficient tensors are shaped ``[..., L, N]`` and
per-limb constants ``[L, 1]``, so one call handles a whole RNS tower.
Montgomery arithmetic with R = 2^32 is used throughout; precomputed
constants come from :class:`MontParams`.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32
_MASK16 = np.uint32(0xFFFF)


@dataclasses.dataclass(frozen=True)
class MontParams:
    """Per-limb Montgomery constants, host-precomputed as numpy uint32.

    Arrays are shaped ``[L, 1]`` so they broadcast against ``[..., L, N]``
    coefficient tensors. Inside jit they become baked-in constants.
    """

    p: np.ndarray        # the limb primes
    ninv: np.ndarray     # -p^{-1} mod 2^32
    r2: np.ndarray       # R^2 mod p  (R = 2^32), in ordinary form
    r1: np.ndarray       # R mod p == to_mont(1)
    half: np.ndarray     # p // 2, for centered lifts

    @staticmethod
    def make(primes: Sequence[int]) -> "MontParams":
        ps = [int(p) for p in primes]
        for p in ps:
            if not (1 < p < (1 << 31)):
                raise ValueError(f"limb prime {p} out of range (need < 2^31)")
        col = lambda xs: np.asarray(xs, dtype=np.uint64).astype(np.uint32).reshape(-1, 1)
        R = 1 << 32
        return MontParams(
            p=col(ps),
            ninv=col([(-pow(p, -1, R)) % R for p in ps]),
            r2=col([R * R % p for p in ps]),
            r1=col([R % p for p in ps]),
            half=col([p // 2 for p in ps]),
        )

    @property
    def nlimbs(self) -> int:
        return self.p.shape[0]

    def moduli(self) -> list:
        return [int(x) for x in self.p.ravel()]

    def select(self, which) -> "MontParams":
        """Sub-tower restricted to the given limb indices (crtselect)."""
        idx = np.asarray(which)
        return MontParams(self.p[idx], self.ninv[idx], self.r2[idx],
                          self.r1[idx], self.half[idx])

    def expand(self) -> "MontParams":
        """Constants reshaped [L,1] -> [L,1,1] to broadcast over an extra
        trailing axis (used by cross-base contraction kernels)."""
        f = lambda a: a[:, :, None]
        return MontParams(f(self.p), f(self.ninv), f(self.r2), f(self.r1), f(self.half))


def mul32(a, b):
    """Full 32x32 -> 64 product as (hi, lo) uint32 pair.

    Built from 16-bit halves because the TPU VPU has no 64-bit multiplier.
    """
    a = a.astype(U32)
    b = b.astype(U32)
    ah, al = a >> 16, a & _MASK16
    bh, bl = b >> 16, b & _MASK16
    lo16 = al * bl
    m1 = ah * bl
    m2 = al * bh
    # Middle column with explicit carry handling (m1 + m2 may exceed 2^32).
    mid = (m1 & _MASK16) + (m2 & _MASK16) + (lo16 >> 16)
    lo = (lo16 & _MASK16) | (mid << 16)
    hi = ah * bh + (m1 >> 16) + (m2 >> 16) + (mid >> 16)
    return hi, lo


def mont_mul(a, b, mp: MontParams):
    """Montgomery product REDC(a*b) = a*b*R^{-1} mod p, inputs in [0, p).

    If ``b`` is stored in Montgomery form (b*R mod p) the result is the
    plain product a*b mod p — the convention used for all precomputed
    twiddles and scalars.
    """
    hi, lo = mul32(a, b)
    m = lo * mp.ninv                       # mod 2^32 automatically
    mp_hi, _ = mul32(m, mp.p)
    # low 32 bits of (lo + m*p) are exactly zero; carry is 1 unless lo == 0.
    t = hi + mp_hi + (lo != 0).astype(U32)
    return jnp.where(t >= mp.p, t - mp.p, t)


def to_mont(a, mp: MontParams):
    return mont_mul(a, mp.r2, mp)


def from_mont(a, mp: MontParams):
    """Montgomery form -> ordinary form (multiply by 1 under REDC)."""
    return mont_mul(a, jnp.ones_like(a), mp)


def mul_mod(a, b, mp: MontParams):
    """Plain modular product of two ordinary-form tensors (2 REDC passes)."""
    return mont_mul(to_mont(a, mp), b, mp)


def add_mod(a, b, mp: MontParams):
    t = a + b                              # < 2^32 since both < p < 2^31
    return jnp.where(t >= mp.p, t - mp.p, t)


def sub_mod(a, b, mp: MontParams):
    t = a - b
    return jnp.where(a < b, t + mp.p, t)


def neg_mod(a, mp: MontParams):
    return jnp.where(a == 0, a, mp.p - a)


def centered(a, mp: MontParams):
    """Centered representative in (-p/2, p/2] as int32 (SignedMod lift)."""
    return jnp.where(a > mp.half, a.astype(I32) - mp.p.astype(I32), a.astype(I32))


def from_signed(x, mp: MontParams):
    """Reduce signed int32 values into [0, p) residues."""
    return jnp.mod(x.astype(I32), mp.p.astype(I32)).astype(U32)


def mod_sum(terms, mp: MontParams, axis: int):
    """Tree-reduce modular sum along ``axis`` (p broadcastable to result)."""
    terms = jnp.moveaxis(terms, axis, 0)
    k = terms.shape[0]
    while k > 1:
        half = k // 2
        red = add_mod(terms[:half], terms[half:2 * half], mp)
        if k % 2:
            red = jnp.concatenate([red, terms[2 * half:]], axis=0)
        terms = red
        k = terms.shape[0]
    return terms[0]


def umod(x, q):
    """x mod q for uint32 tensors against a broadcastable uint32 modulus."""
    return jnp.remainder(x.astype(U32), q.astype(U32) if hasattr(q, "astype") else np.uint32(q))


def pow_mod_scalar(base: int, exp: int, p: int) -> int:
    return pow(int(base), int(exp), int(p))
