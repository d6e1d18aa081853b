"""CKKS bootstrapping groundwork — beyond the reference's scope.

The reference stops at leveled CKKS (ToyFHE has no bootstrap). This
module builds the three primitives every CKKS bootstrap is made of, on
top of the engine's rotation/keyswitch machinery:

  * **BSGS homomorphic linear transform** — Enc(v) → Enc(M·v) for an
    arbitrary plaintext matrix M on the slot vector, via the diagonal
    method with baby-step/giant-step rotation batching (O(√d) galois
    keys and rotations instead of O(d)); generalizes the rotation
    matmul of the MNIST dense layers (infer.jl:141-150).
  * **Slot conjugation** — the galois element 2N−1 acts as complex
    conjugation on slots.
  * **CoeffToSlot / SlotToCoeff** — the linear phases of bootstrap:
    move the coefficient vector into the slots (where a polynomial can
    approximate the mod-q reduction) and back. Derived from the decode
    matrix U[j,k] = ω^{k·g_j}, ω = e^{−2πi/2N}, g_j = 3^{j+1} mod 2N
    (core/ckks_encoding.py::ckks_decode): since the full odd-row DFT is
    √N-unitary, c = (1/N)(Uᴴ v + Ūᴴ v̄) — two transforms plus one
    conjugation.
  * **Low-depth polynomial evaluation** (Paterson–Stockmeyer-style
    power basis) — the EvalMod ingredient; evaluates a degree-d
    polynomial with O(log d) ct×ct depth.

What full bootstrap still needs (round-2+): ModRaise of an exhausted
ciphertext to the top tower, the scaled-sine EvalMod polynomial with
double-angle iterations, and parameter sets deep enough to hold them.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Sequence

import numpy as np

from . import ckks_encoding as CE
from . import rlwe
from .rlwe import CipherText, GaloisKeys, galois_element_for_steps
from .ckks_encoding import CKKSTag, mul_plain_vector, ckks_encode
from . import ring as R


# ---------------------------------------------------------------------------
# rotation helpers
# ---------------------------------------------------------------------------

def rotate_steps(gks: GaloisKeys, c: CipherText, steps: int) -> CipherText:
    """Slot rotation by ``steps`` (rot_k(v)[j] = v[(j+k) mod n/2]),
    resolving the galois key from the set. steps ≡ 0 is the identity."""
    n = c.ring.n
    k = steps % (n // 2)
    if k == 0:
        return c
    return rlwe.rotate(gks.for_element(galois_element_for_steps(n, -k)), c)


def conjugate(gk_conj, c: CipherText) -> CipherText:
    """Complex conjugation of the slot vector: galois element 2N−1
    (evaluation points ζ^g ↦ ζ^{−g}), then keyswitch."""
    return rlwe.rotate(gk_conj, c)


def keygen_bootstrap_keys(rng, priv, bs: int, gs: int):
    """Galois keys for BSGS transforms (baby steps 1..bs−1, giant steps
    bs, 2bs, ...) plus the conjugation key. Returns (GaloisKeys, conj_key)."""
    import jax

    n = priv.params.ring_key.n
    steps = sorted({s % (n // 2) for s in range(1, bs)} |
                   {(g * bs) % (n // 2) for g in range(1, gs)} - {0})
    elements = [galois_element_for_steps(n, -s) for s in steps if s]
    ks = jax.random.split(rng, len(elements) + 1)
    keys = [rlwe.keygen_galois(k, priv, galois_element=e)
            for k, e in zip(ks[:-1], elements)]
    conj = rlwe.keygen_galois(ks[-1], priv, galois_element=2 * n - 1)
    return GaloisKeys(keys), conj


# ---------------------------------------------------------------------------
# BSGS homomorphic linear transform (diagonal method)
# ---------------------------------------------------------------------------

def bsgs_split(d: int):
    bs = max(1, int(math.isqrt(d)))
    gs = (d + bs - 1) // bs
    return bs, gs


def linear_transform(gks: GaloisKeys, c: CipherText, M: np.ndarray
                     ) -> CipherText:
    """Enc(v) → Enc(M·v) for M ∈ ℂ^{d×d}, d = N/2 slots.

    Diagonal method with BSGS batching:
        M·v = Σ_g rot_{g·bs}( Σ_b rot_{−g·bs}(diag_{g·bs+b}) ⊙ rot_b(v) )
    where diag_k[j] = M[j, (j+k) mod d]. Consumes one multiplicative
    level (output scale = scale²; rescale afterwards). Zero diagonals
    are skipped, so banded/sparse M cost proportionally less.
    """
    d = c.ring.n // 2
    M = np.asarray(M, dtype=np.complex128)
    assert M.shape == (d, d)
    j = np.arange(d)
    diags = {k: M[j, (j + k) % d] for k in range(d)}
    bs, gs = bsgs_split(d)

    baby = {0: c}
    out = None
    for g in range(gs):
        inner = None
        for b in range(bs):
            k = g * bs + b
            if k >= d:
                break
            dk = diags[k]
            if not np.any(dk):
                continue
            if b not in baby:
                baby[b] = rotate_steps(gks, c, b)
            dk_shift = np.roll(dk, g * bs)          # rot_{−g·bs}(diag_k)
            term = mul_plain_vector(baby[b], dk_shift)
            inner = term if inner is None else rlwe.ct_add(inner, term)
        if inner is None:
            continue
        outer = rotate_steps(gks, inner, g * bs)
        out = outer if out is None else rlwe.ct_add(out, outer)
    if out is None:                                  # M == 0
        z = mul_plain_vector(c, np.zeros(d))
        return z
    return out


# ---------------------------------------------------------------------------
# CoeffToSlot / SlotToCoeff
# ---------------------------------------------------------------------------

def decode_matrix(n: int) -> np.ndarray:
    """U ∈ ℂ^{N/2 × N}: slots = U · coeffs (the CKKS decode map at
    scale 1; matches ckks_decode bit-for-float)."""
    m = 2 * n
    g = 3 ** (np.arange(1, n // 2 + 1, dtype=object)) % m
    g = np.asarray([int(x) for x in g], dtype=np.float64)
    k = np.arange(n)
    return np.exp(-2j * np.pi * np.outer(g, k) / m)


def coeff_to_slot(gks: GaloisKeys, gk_conj, c: CipherText):
    """Enc(v) → (Enc(c_lo), Enc(c_hi)): the slot vectors become the low
    and high halves of the COEFFICIENT vector of the underlying
    plaintext polynomial (each divided by the ciphertext scale).

    c_k = (1/N)·(Σ_j Ū[j,k]·v_j + Σ_j U[j,k]·v̄_j) — two BSGS linear
    transforms on (ct, conj(ct)). Consumes one level; rescale after.
    """
    n = c.ring.n
    h = n // 2
    U = decode_matrix(n)
    cbar = conjugate(gk_conj, c)
    lo = rlwe.ct_add(linear_transform(gks, c, np.conj(U[:, :h]).T / n),
                     linear_transform(gks, cbar, U[:, :h].T / n))
    hi = rlwe.ct_add(linear_transform(gks, c, np.conj(U[:, h:]).T / n),
                     linear_transform(gks, cbar, U[:, h:].T / n))
    return lo, hi


def slot_to_coeff(gks: GaloisKeys, c_lo: CipherText, c_hi: CipherText
                  ) -> CipherText:
    """Inverse of :func:`coeff_to_slot`: slots(out) = A·c_lo + B·c_hi
    with U = [A | B] — the encode map applied homomorphically."""
    n = c_lo.ring.n
    h = n // 2
    U = decode_matrix(n)
    return rlwe.ct_add(linear_transform(gks, c_lo, U[:, :h]),
                       linear_transform(gks, c_hi, U[:, h:]))


# ---------------------------------------------------------------------------
# homomorphic polynomial evaluation (EvalMod ingredient)
# ---------------------------------------------------------------------------

def _mul_rescale(ek, a: CipherText, b: CipherText) -> CipherText:
    return rlwe.ct_rescale(rlwe.keyswitch(ek, rlwe.ct_mul(a, b)))


def eval_poly(ek, c: CipherText, coeffs: Sequence[float]) -> CipherText:
    """Homomorphic p(x) = Σ aᵢxⁱ by Horner's rule:

        r ← a_d;  r ← rescale(r·x) + a_{i}   for i = d−1 … 0

    Every step multiplies by the SAME x (auto-aligned to r's tower by
    ct_mul's limb-drop), so scales stay uniform along the single Horner
    chain — no cross-path scale reconciliation. Consumes deg(p) levels
    (the exact-Fraction scale tag makes a low-depth Paterson–Stockmeyer
    variant a cross-path alignment problem; that optimization belongs
    with the full EvalMod in round 2+).
    """
    coeffs = [float(a) for a in coeffs]
    deg = len(coeffs) - 1
    if deg < 1:
        raise ValueError("constant polynomial — nothing to evaluate")
    r = CE.add_plain(rlwe.ct_rescale(
        CE.mul_plain_scalar(c, coeffs[deg])), coeffs[deg - 1])
    for i in range(deg - 2, -1, -1):
        x = c
        while x.ring.nlimbs > r.ring.nlimbs:
            x = rlwe.ct_modswitch_drop(x)
        r = CE.add_plain(_mul_rescale(ek, r, x), coeffs[i])
    return r
