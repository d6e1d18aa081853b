"""CKKS slot encoding — ``/root/reference/src/ckksencoding.jl``.

ℂ^{N/2} slots via the conjugate-symmetric embedding with the ψ-twist that
makes the FFT negacyclic, and the ℤm* slot permutation that makes Galois
act as ``circshift`` (ckksencoding.jl:3-97).

Encode/decode run host-side in float64 with exact-bigint quantization —
the reference encodes client-side with FFTW/BigFloat (ckksencoding.jl:
61,84), and on TPU the encoder is off the hot path by design (SURVEY
§2.8: FFTW → host FFT; precision matters more than speed here). Exact
scale arithmetic uses ``fractions.Fraction`` (the FixedRational role).
"""

from __future__ import annotations

import dataclasses
import math
import os
from fractions import Fraction
from typing import Optional, Union

import numpy as np

from ..utils import numtheory as nt
from . import ring as R
from . import rlwe
from .ring import RingContext, RingElt
from .rlwe import CipherText

ScaleLike = Union[int, Fraction]


def zmstar_indices(n: int) -> tuple:
    """Rows of the ℤ_{2N}* permutation matrix, already halved
    (ℤmstarPermutation, ckksencoding.jl:40-54): for j = 1..N/2,
    row1[j] = (3^j mod 2N) >> 1 indexes the kept (non-conjugate) FFT bin,
    row2[j] its conjugate partner."""
    m = 2 * n
    r1 = np.empty(n // 2, dtype=np.int64)
    r2 = np.empty(n // 2, dtype=np.int64)
    g = 1
    for j in range(n // 2):
        g = g * 3 % m
        r1[j] = g >> 1
        r2[j] = (m - g) >> 1
    return r1, r2


@dataclasses.dataclass(frozen=True)
class CKKSTag:
    """Decode tag carried on CKKS ciphertexts: tracks the scale exactly
    (FixedRational type-level algebra, ckks.jl:85-92). Frozen/hashable —
    it rides as static pytree metadata when ciphertexts cross a jit
    boundary."""

    scale: Fraction

    def combine_mul(self, other: "CKKSTag") -> "CKKSTag":
        return CKKSTag(self.scale * other.scale)          # ckksencoding.jl:133-135

    def combine_add(self, other: "CKKSTag") -> "CKKSTag":
        if self.scale != other.scale:
            raise ValueError(f"adding ciphertexts at different scales: "
                             f"{self.scale} vs {other.scale}")
        return self

    def rescale_by(self, prime: int) -> "CKKSTag":
        return CKKSTag(self.scale / prime)                # ckksencoding.jl:126-130

    def decode(self, params, dec: RingElt, ring: RingContext) -> np.ndarray:
        return ckks_decode(ring, dec, self.scale)


@dataclasses.dataclass
class CKKSPlaintext:
    """A slot vector awaiting encryption (CKKSEncoding{Tscale} value)."""

    ring: RingContext
    slots: np.ndarray          # complex128[N/2]
    scale: Fraction

    def to_ring(self, params) -> RingElt:
        return ckks_encode(self.ring, self.slots, self.scale)

    def decode_tag(self, params) -> CKKSTag:
        return CKKSTag(Fraction(self.scale))


def make_plaintext(ring: RingContext, values, scale: ScaleLike) -> CKKSPlaintext:
    slots = np.zeros(ring.n // 2, dtype=np.complex128)
    slots[:] = values
    return CKKSPlaintext(ring, slots, Fraction(scale))


def ckks_encode(ring: RingContext, slots, scale: ScaleLike) -> RingElt:
    """slots ∈ ℂ^{N/2} → ring element (ckksencoding.jl:68-97):
    conjugate-symmetrize through the ℤm* permutation, inverse FFT,
    ψ-twist, then exact-bigint quantization by the scale."""
    import jax.numpy as jnp

    n = ring.n
    scale = Fraction(scale)
    slots = np.asarray(slots, dtype=np.complex128)
    assert slots.shape == (n // 2,)
    r1, r2 = zmstar_indices(n)
    cmplx = np.zeros(n, dtype=np.complex128)
    cmplx[r1] = slots
    cmplx[r2] = np.conj(slots)
    ipoints = np.fft.ifft(cmplx)
    k = np.arange(n)
    nipoints = ipoints * np.exp(2j * np.pi * k / (2 * n))
    if not np.allclose(nipoints.imag, 0, atol=1e-9):
        raise ValueError("CKKS encode: non-negligible imaginary part")
    q = ring.modulus
    # Exact quantization (the reference's round(BigInt, big(x)*denom),
    # ckks.jl:43-47). Fast path: when the scale is a power of two and the
    # scaled magnitudes fit float64's integer range, ldexp+rint is exact.
    real = nipoints.real
    if (scale.denominator == 1 and (scale.numerator & (scale.numerator - 1)) == 0
            and float(np.max(np.abs(real), initial=0.0))
            * nt.frac_to_float(scale) < 2 ** 52):
        scaled = np.rint(np.ldexp(real, scale.numerator.bit_length() - 1))
        ints = scaled.astype(np.int64)
        out = np.zeros((ring.nlimbs, n), dtype=np.uint32)
        for l, p in enumerate(ring.primes):
            out[l] = np.mod(ints, p).astype(np.uint32)
        return RingElt(primal=jnp.asarray(out))
    coeffs = []
    for x in real:
        v = Fraction(x) * scale
        m = (2 * v.numerator + v.denominator) // (2 * v.denominator)  # round half up
        coeffs.append(m % q)
    return RingElt(primal=jnp.asarray(ring.from_bigint(coeffs)))


def ckks_decode(ring: RingContext, re: RingElt, scale: ScaleLike) -> np.ndarray:
    """Ring element → slots ∈ ℂ^{N/2} (ckksencoding.jl:56-66)."""
    n = ring.n
    scale = Fraction(scale)
    re = R.ensure_primal(ring, re)
    arr = np.asarray(re.primal)
    nat = ring.native()
    if nat is not None:
        vals = nat.decode_centered_double(arr) / nt.frac_to_float(scale)
    else:
        xs = ring.to_bigint(arr)
        q = ring.modulus
        vals = np.array([nt.frac_to_float(Fraction(nt.centered(x, q)) / scale)
                         for x in xs])
    k = np.arange(n)
    multed = vals * np.exp(-2j * np.pi * k / (2 * n))
    f = np.fft.fft(multed)
    r1, _ = zmstar_indices(n)
    return f[r1]


# ---------------------------------------------------------------------------
# Plaintext-ciphertext arithmetic (ckksencoding.jl:100-124)
# ---------------------------------------------------------------------------

def _ct_scale(c: CipherText) -> Fraction:
    if not isinstance(c.enc, CKKSTag):
        raise ValueError("ciphertext carries no CKKS scale tag")
    return c.enc.scale


def mul_plain_scalar(c: CipherText, x: float) -> CipherText:
    """c ·ₚ scalar — quantize at the ciphertext's scale; result scale
    squares (ckksencoding.jl:100-105)."""
    return mul_plain_scalar_at(c, x, _ct_scale(c))


def mul_plain_scalar_at(c: CipherText, x, at_scale: ScaleLike) -> CipherText:
    """c ·ₚ scalar quantized at an EXPLICIT scale: result scale is
    exactly ``ct_scale · at_scale`` (quantization error ≤ 1/(2·at_scale)
    relative, absorbed into the noise). This is the exact-scale-algebra
    primitive behind cross-path alignment (``ct_to``) and the
    Paterson–Stockmeyer evaluator's per-term scale matching — beyond the
    reference, which has no ct+ct at differing FixedRational scales."""
    scale = _ct_scale(c)
    at_scale = Fraction(at_scale)
    if at_scale <= 0:
        raise ValueError("at_scale must be positive")
    q = c.ring.modulus
    v = Fraction(x) * at_scale
    m = (2 * v.numerator + v.denominator) // (2 * v.denominator)
    if os.environ.get("TOYFHE_DEBUG_SCALES") and x != 0:
        rel = abs(Fraction(m) - v) / abs(v) if v else Fraction(0)
        if rel > Fraction(1, 1 << 24):
            print(f"[scales] mul_plain_scalar_at COARSE: x={float(x):.6g} "
                  f"at={float(at_scale):.6g} m={m} rel_err={float(rel):.3e}",
                  flush=True)
    s = c.ring.scalar_residues(m % q)
    cs = tuple(R.scalar_mul(c.ring, s, x_) for x_ in c.cs)
    return CipherText(c.params, cs, c.ring, enc=CKKSTag(scale * at_scale))


def mul_plain_vector_at(c: CipherText, vec, at_scale: ScaleLike) -> CipherText:
    """c ·ₚ slot vector quantized at an explicit scale (see
    :func:`mul_plain_scalar_at`); result scale = ct_scale · at_scale."""
    scale = _ct_scale(c)
    at_scale = Fraction(at_scale)
    # Routed through _pe_dual_cached so record/replay plaintext caches
    # see this encode site too (otherwise the encode would be baked as
    # an HLO constant under trace_plain_cache, defeating the
    # diagonals-as-device-buffers design).
    pe = _pe_dual_cached(c.ring, lambda: ckks_encode(
        c.ring, np.asarray(vec, dtype=np.complex128), at_scale))
    cs = tuple(R.mul(c.ring, x_, pe) for x_ in c.cs)
    return CipherText(c.params, cs, c.ring, enc=CKKSTag(scale * at_scale))


def retag(c: CipherText, scale: ScaleLike) -> CipherText:
    """Reinterpret the ciphertext at a different exact scale — free and
    noiseless (no data touched); the decoded VALUE is divided by
    new/current. Bootstrap uses this to divide by q₀ exactly."""
    return CipherText(c.params, c.cs, c.ring, enc=CKKSTag(Fraction(scale)))


def mul_int(c: CipherText, k: int) -> CipherText:
    """Exact small-integer multiply: scales the VALUE by k, scale tag
    unchanged (used for the 2·T_a·T_b Chebyshev recurrences)."""
    s = c.ring.scalar_residues(int(k) % c.ring.modulus)
    cs = tuple(R.scalar_mul(c.ring, s, x_) for x_ in c.cs)
    return CipherText(c.params, cs, c.ring, enc=c.enc)


def ct_drop_to(c: CipherText, nlimbs: int) -> CipherText:
    """Drop limbs (no rescale) until the tower has ``nlimbs`` levels."""
    while c.ring.nlimbs > nlimbs:
        c = rlwe.ct_modswitch_drop(c)
    if c.ring.nlimbs != nlimbs:
        raise ValueError(
            f"cannot raise tower: at {c.ring.nlimbs}, want {nlimbs}")
    return c


def ct_to(c: CipherText, nlimbs: int, scale: ScaleLike) -> CipherText:
    """Bring a CKKS ciphertext to an EXACT (tower length, scale) target
    using spare levels: limb drops plus, when the scale differs, one
    scalar multiply at the correcting scale r = scale·(∏ dropped p)/cur
    followed by rescales. Uses as many spare levels as needed to make
    the ratio comfortably quantizable (r ≥ 2^8 when levels allow, ≥ 2
    at minimum) — the actual prime values drift with N, so a ratio that
    clears the bar at one ring dimension can dip below it at another."""
    scale = Fraction(scale)
    cur = _ct_scale(c)
    if cur == scale:
        return ct_drop_to(c, nlimbs)
    avail = c.ring.nlimbs - nlimbs
    if avail <= 0:
        raise ValueError(
            f"no spare level for scale alignment: at {c.ring.nlimbs} limbs, "
            f"target {nlimbs} with scale {float(scale):g} != {float(cur):g}")
    r = Fraction(0)
    for j in range(1, max(avail, 1) + 1):
        cj = ct_drop_to(c, nlimbs + j)
        r = scale * math.prod(cj.ring.primes[-j:]) / cur
        if r >= (1 << 8) or (j == avail and r >= 2):
            if os.environ.get("TOYFHE_DEBUG_SCALES"):
                import math as _m
                inter = [float(cur * r)] + [
                    float(cur * r / _m.prod(cj.ring.primes[-i:]))
                    for i in range(1, j + 1)]
                print(f"[scales] ct_to: {c.ring.nlimbs}->{nlimbs} limbs "
                      f"j={j} log2r={float(_m.log2(r)):.1f} "
                      f"log2 intermediate scales="
                      f"{[round(_m.log2(max(s_, 1e-300)), 1) for s_ in inter]}",
                      flush=True)
            c = mul_plain_scalar_at(cj, 1.0, r)
            for _ in range(j):
                c = rlwe.ct_rescale(c)
            return c
    raise ValueError(f"alignment ratio {float(r):g} too small to quantize "
                     f"({avail} spare levels)")


# ---------------------------------------------------------------------------
# Plaintext-encode cache: record trace-time diagonal encodes, replay them
# as jit ARGUMENTS. Encoded diagonals at production N are hundreds of MB;
# baked as HLO constants they bloat compiles and can exceed upload limits
# (remote-compile HTTP 413). Two-pass flow: trace once in "record" mode
# (encodes run on host as usual, dual forms are captured in site order),
# then re-trace in "replay" mode with the captured arrays threaded in as
# pytree leaves — same graph, constants become device buffers.
# ---------------------------------------------------------------------------

_pt_cache = None


class PlainCache:
    """Site-ordered store of encoded plaintext duals (see above)."""

    def __init__(self):
        self.items = []           # record: np arrays; replay: traced arrays
        self.mode = None
        self.i = 0


import contextlib


@contextlib.contextmanager
def plaintext_cache(cache: PlainCache, mode: str):
    """Enter record/replay mode for the duration of a trace. In replay,
    ``cache.items`` may hold traced arrays (jit arguments)."""
    global _pt_cache
    assert mode in ("record", "replay")
    prev = _pt_cache
    cache.mode = mode
    cache.i = 0
    _pt_cache = cache
    try:
        yield cache
    finally:
        _pt_cache = prev
        cache.mode = None


def _pe_dual_cached(ring: RingContext, encode_fn):
    """Dual-form encoded plaintext, routed through the active cache."""
    import jax.numpy as jnp

    cache = _pt_cache
    if cache is not None and cache.mode == "replay":
        pe = cache.items[cache.i]
        cache.i += 1
        return RingElt(dual=pe)
    if cache is not None and cache.mode == "record":
        # the encode inputs are host constants, but the dual transform
        # is a jitted subcall that would otherwise inline as traced ops
        # under an enclosing trace (bootstrap.trace_plain_cache) — force
        # concrete evaluation so the item is recordable
        import jax
        with jax.ensure_compile_time_eval():
            pe = R.ensure_dual(ring, encode_fn()).dual
        cache.items.append(np.asarray(pe))
        return RingElt(dual=pe)
    return RingElt(dual=R.ensure_dual(ring, encode_fn()).dual)


def mul_plain_vector(c: CipherText, vec) -> CipherText:
    """c ·ₚ slot vector (ckksencoding.jl:107-113)."""
    scale = _ct_scale(c)
    pe = _pe_dual_cached(c.ring, lambda: ckks_encode(
        c.ring, np.asarray(vec, dtype=np.complex128), scale))
    cs = tuple(R.mul(c.ring, x_, pe) for x_ in c.cs)
    return CipherText(c.params, cs, c.ring, enc=CKKSTag(scale * scale))


def mul_plain_vectors(c: CipherText, vecs,
                      at_scale: Optional[ScaleLike] = None) -> CipherText:
    """Batched slot-vector multiply: ``vecs[B, d]`` aligns with a
    batch-B ciphertext's leading axis (one plaintext per batch element).
    Encoded at the ciphertext's scale, or at ``at_scale`` when given —
    the scale-management hook that pins transform levels to a target
    scale instead of letting s → s²/q drift compound (composite-scale
    bootstrap). The factored bootstrap transforms use this to push four
    transform chains through ONE stacked ciphertext, sharing every
    rotation/keyswitch."""
    import jax.numpy as jnp

    scale = _ct_scale(c)
    at = scale if at_scale is None else Fraction(at_scale)

    def enc():
        vs = np.asarray(vecs, dtype=np.complex128)
        pes = [ckks_encode(c.ring, v, at).primal for v in vs]
        return RingElt(primal=jnp.stack(pes, axis=0))

    pe = _pe_dual_cached(c.ring, enc)
    cs = tuple(R.mul(c.ring, x_, pe) for x_ in c.cs)
    return CipherText(c.params, cs, c.ring, enc=CKKSTag(scale * at))


def add_plain(c: CipherText, vals) -> CipherText:
    """c +ₚ scalar-or-vector broadcast (ckksencoding.jl:115-124)."""
    scale = _ct_scale(c)
    if os.environ.get("TOYFHE_DEBUG_SCALES"):
        if scale < (1 << 24):
            print(f"[scales] add_plain COARSE: scale={float(scale):.6g}",
                  flush=True)
    slots = np.zeros(c.ring.n // 2, dtype=np.complex128)
    slots[:] = vals
    pe = ckks_encode(c.ring, slots, scale)
    return rlwe.ct_add_ring(c, pe)
