"""Negacyclic number-theoretic transform over RNS towers (layer L2).

TPU-native redesign of the reference's ψ-twisted Cooley–Tukey NTT
(``/root/reference/src/pow2_cyc_rings.jl:238-318``): instead of per-ring
``@generated`` Julia kernels, the transform is expressed as log2(N)
fully-vectorized radix-2 butterfly stages over a dense ``uint32[..., L, N]``
tensor, one limb per RNS prime, so XLA fuses each stage into wide VPU ops
and the same code runs on CPU (tests) and TPU (bench). A Pallas kernel
specialization lives in ops/ntt_pallas.py.

Conventions (chosen to match the reference bit-for-bit):
  * forward:  dual[k] = a(ψ^{2k+1}) — PowMulψ premultiply then DFT with
    ω = ψ², natural output order (``pow2_cyc_rings.jl:295-303``).
  * inverse:  DFT with ω^{-1}, then n^{-1}·ψ^{-i} untwist
    (``pow2_cyc_rings.jl:308-318``).

All twiddles are stored in Montgomery form so each butterfly costs one
REDC multiply.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import modmath
from .modmath import U32, MontParams, mul32

__all__ = ["NttTables", "ntt", "intt", "galois_perm_tables", "apply_galois",
           "naive_negacyclic_mul"]


def _bitrev_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


def _to_mont_np(x: np.ndarray, p: int) -> np.ndarray:
    return ((x.astype(object) * (1 << 32)) % p).astype(np.uint64).astype(np.uint32)


class NttTables:
    """Per-ring precomputed twiddle tables (host numpy; jit constants).

    Plays the role of the reference ``NegacyclicRing{F,N}.ψ`` cache
    (``pow2_cyc_rings.jl:27-47``) plus FourierTransforms' CTPlan twiddles.
    Identity-hashed: build once per ring and reuse.
    """

    def __init__(self, n: int, primes: Sequence[int], psis: Optional[Sequence[int]] = None):
        from ..utils import numtheory as nt

        assert n & (n - 1) == 0, "power-of-two rings only (pow2_cyc_rings)"
        self.n = n
        self.primes = [int(p) for p in primes]
        self.mp = MontParams.make(self.primes)
        if psis is None:
            psis = [nt.minimal_primitive_root_of_unity(p, 2 * n) for p in self.primes]
        self.psis = [int(x) for x in psis]
        L = len(self.primes)
        self.bitrev = _bitrev_perm(n)

        # ψ^i premultiply / n^{-1}ψ^{-i} postmultiply tables, Montgomery form.
        psi_pow = np.zeros((L, n), dtype=np.uint32)
        psi_ipow = np.zeros((L, n), dtype=np.uint32)
        for l, (p, psi) in enumerate(zip(self.primes, self.psis)):
            ipsi = pow(psi, -1, p)
            ninv = pow(n, -1, p)
            pows = np.ones(n, dtype=object)
            ipows = np.ones(n, dtype=object)
            for i in range(1, n):
                pows[i] = pows[i - 1] * psi % p
                ipows[i] = ipows[i - 1] * ipsi % p
            psi_pow[l] = _to_mont_np(pows, p)
            psi_ipow[l] = _to_mont_np((ipows * ninv) % p, p)
        self.psi_pow = psi_pow
        self.psi_ipow = psi_ipow

        # Per-stage DFT twiddles ω^{j·N/len}, Montgomery form, shape (L,1,half).
        self.stage_tw: List[np.ndarray] = []
        self.stage_tw_inv: List[np.ndarray] = []
        ln = 2
        while ln <= n:
            half = ln // 2
            tw = np.zeros((L, 1, half), dtype=np.uint32)
            twi = np.zeros((L, 1, half), dtype=np.uint32)
            for l, (p, psi) in enumerate(zip(self.primes, self.psis)):
                omega = psi * psi % p
                w = pow(omega, n // ln, p)
                wi = pow(w, -1, p)
                ws = np.ones(half, dtype=object)
                wis = np.ones(half, dtype=object)
                for j in range(1, half):
                    ws[j] = ws[j - 1] * w % p
                    wis[j] = wis[j - 1] * wi % p
                tw[l, 0] = _to_mont_np(ws, p)
                twi[l, 0] = _to_mont_np(wis, p)
            self.stage_tw.append(tw)
            self.stage_tw_inv.append(twi)
            ln *= 2

        # Broadcast-ready modulus constants for stage tensors (L,1,1).
        self._p3 = self.mp.p.reshape(L, 1, 1)
        self._ninv3 = self.mp.ninv.reshape(L, 1, 1)
        # Harvey lazy butterflies need 4p < 2^32
        self.lazy_ok = max(self.primes) < (1 << 30)

    # identity hash/eq → safe as a jit static argument
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _mont_mul_raw(a, b, p, ninv):
    hi, lo = mul32(a, b)
    m = lo * ninv
    mp_hi, _ = mul32(m, p)
    t = hi + mp_hi + (lo != 0).astype(U32)
    return jnp.where(t >= p, t - p, t)


def _mont_mul_lazy(a, b, p, ninv):
    """REDC without the final conditional subtract: input a < 2^32, b < p;
    output in [0, 2p)."""
    hi, lo = mul32(a, b)
    m = lo * ninv
    mp_hi, _ = mul32(m, p)
    return hi + mp_hi + (lo != 0).astype(U32)


def _add_raw(a, b, p):
    t = a + b
    return jnp.where(t >= p, t - p, t)


def _sub_raw(a, b, p):
    t = a - b
    return jnp.where(a < b, t + p, t)


def _dft_stages(tables: NttTables, x, tw_list):
    """Radix-2 DIT stages: bit-reversed input → natural-order DFT output.

    Harvey-style lazy reduction when all primes < 2^30: butterflies keep
    values in [0, 4p) with a single conditional per butterfly (reduce u
    into [0, 2p), multiply v lazily into [0, 2p), outputs u±t stay
    < 4p < 2^32); a final two-step correction restores canonical [0, p).
    Falls back to the fully-reduced butterfly for larger primes.
    """
    n = tables.n
    lead = x.shape[:-1]           # (..., L)
    p3, ninv3 = tables._p3, tables._ninv3
    x = jnp.take(x, jnp.asarray(tables.bitrev), axis=-1)
    lazy = tables.lazy_ok
    two_p = p3 + p3
    ln = 2
    for s in range(n.bit_length() - 1):
        half = ln // 2
        xs = x.reshape(lead + (n // ln, ln))
        u = xs[..., :half]
        v = xs[..., half:]
        if lazy:
            u = jnp.where(u >= two_p, u - two_p, u)           # [0, 2p)
            t = _mont_mul_lazy(v, jnp.asarray(tw_list[s]), p3, ninv3)
            x = jnp.concatenate([u + t, u + two_p - t], axis=-1)
        else:
            t = _mont_mul_raw(v, jnp.asarray(tw_list[s]), p3, ninv3)
            x = jnp.concatenate([_add_raw(u, t, p3), _sub_raw(u, t, p3)],
                                axis=-1)
        x = x.reshape(lead + (n,))
        ln *= 2
    if lazy:
        p2 = jnp.asarray(tables.mp.p)         # (L, 1) for the flat layout
        tp2 = p2 + p2
        x = jnp.where(x >= tp2, x - tp2, x)
        x = jnp.where(x >= p2, x - p2, x)
    return x


def _mxu_tables(tables: NttTables):
    """TPU production path selector: the MXU four-step Pallas kernel with
    paired-diagonal recombination measures 3-5× the radix-2 XLA schedule
    at N=2^14 (tools/bench_kernels.py, docs/performance.md), so it is the
    default on TPU whenever the ring supports it. Returns the cached
    MxuNttTables or None (non-TPU backend, unsupported ring, or the
    TOYFHE_NTT_IMPL=radix2 escape hatch)."""
    import os

    impl = os.environ.get("TOYFHE_NTT_IMPL", "auto")
    if impl == "radix2":
        return None
    if getattr(tables, "_mxu_cache", "unset") == "unset":
        mt = None
        if (tables.n % 128 == 0 and tables.n >= 256
                and max(tables.primes) < (1 << 30)):
            try:
                from . import ntt_mxu as _mxu
                from . import ntt_mxu_pallas as _mxp
                if _mxp.pl is not None:
                    # derived towers become ROW VIEWS of the root
                    # tower's tables: every level of a compiled program
                    # then embeds ONE shared full-tower constant and
                    # slices rows in-jit (at production N the per-level
                    # constants otherwise sum to hundreds of MB)
                    root = getattr(tables, "root_tables", None)
                    root_mt = _mxu_tables(root) if root is not None else None
                    if isinstance(root_mt, (_mxu.MxuNttTables,
                                            _mxu.MxuRowView)):
                        base = (root_mt.root
                                if isinstance(root_mt, _mxu.MxuRowView)
                                else root_mt)
                        mt = _mxu.MxuRowView(base, tables.root_rows)
                    else:
                        import os as _os
                        n1 = (None if _os.environ.get("TOYFHE_MXU_N1")
                              else _mxu.lane_optimal_n1(tables.n))
                        cand = _mxu.MxuNttTables(tables, n1=n1)
                        if cand.paired_ok:
                            mt = cand
            except Exception:      # pragma: no cover - missing pallas
                mt = None
        tables._mxu_cache = mt
    if tables._mxu_cache is None:
        return None
    if impl != "mxu" and jax.default_backend() != "tpu":
        return None
    return tables._mxu_cache


@functools.partial(jax.jit, static_argnums=0)
def ntt(tables: NttTables, x):
    """Forward negacyclic NTT of uint32[..., L, N] (reference ``nntt``).

    Jitted per (tables, shape): eager call sites pay one dispatch instead
    of ~log2(N) op-by-op dispatches. On TPU, rings with N ≥ 256 divisible
    by 128 and primes < 2^30 run the MXU four-step Pallas kernel
    (bit-exact; see :func:`_mxu_tables`)."""
    mt = _mxu_tables(tables)
    if mt is not None:
        from . import ntt_mxu_pallas as _mxp
        return _mxp.ntt_mxu_nat(mt, x)
    mp = tables.mp
    x = modmath.mont_mul(x, jnp.asarray(tables.psi_pow), mp)
    return _dft_stages(tables, x, tables.stage_tw)


@functools.partial(jax.jit, static_argnums=0)
def intt(tables: NttTables, x):
    """Inverse negacyclic NTT (reference ``inntt``)."""
    mt = _mxu_tables(tables)
    if mt is not None:
        from . import ntt_mxu_pallas as _mxp
        return _mxp.intt_mxu_nat(mt, x)
    mp = tables.mp
    x = _dft_stages(tables, x, tables.stage_tw_inv)
    return modmath.mont_mul(x, jnp.asarray(tables.psi_ipow), mp)


def galois_perm_tables(n: int, galois_element: int):
    """Gather indices + sign mask for x(X) ↦ x(X^g) on primal coefficients.

    Semantics of ``apply_galois_element``
    (``/root/reference/src/pow2_cyc_rings.jl:321-329``): coefficient i moves
    to (g·i mod N) with a sign flip when ⌊g·i/N⌋ is odd. Returned as the
    inverse (gather-form) permutation: ``out[j] = ±x[src[j]]``.
    """
    g = int(galois_element)
    i = np.arange(n, dtype=np.int64)
    dest = (g * i) % n
    sign = ((g * i) // n) % 2
    src = np.zeros(n, dtype=np.int64)
    neg = np.zeros(n, dtype=bool)
    src[dest] = i
    neg[dest] = sign.astype(bool)
    return src, neg


def apply_galois(mp: MontParams, x, src: np.ndarray, neg: np.ndarray):
    """Apply a precomputed galois permutation to uint32[..., L, N] primal."""
    y = jnp.take(x, jnp.asarray(src), axis=-1)
    return jnp.where(jnp.asarray(neg), modmath.neg_mod(y, mp), y)


def galois_dual_perm(n: int, galois_element: int) -> np.ndarray:
    """x(X) ↦ x(X^g) as a DUAL-domain gather (no sign flips).

    The natural-order dual holds evaluations at ψ^{2k+1}; σ_g maps the
    evaluation at ψ^{2k+1} to x(ψ^{(2k+1)g}), a pure permutation of
    evaluation points: ``out[k] = in[(((2k+1)·g mod 2N) − 1)/2]``.
    Enables hoisted rotations: NTT(σ_primal·x) = take(NTT(x), perm)."""
    g = int(galois_element)
    k = np.arange(n, dtype=np.int64)
    return (((2 * k + 1) * g) % (2 * n) - 1) // 2


@functools.lru_cache(maxsize=None)
def galois_dual_perm_dev(n: int, galois_element: int) -> np.ndarray:
    """:func:`galois_dual_perm` as a cached int32 numpy array — rotation-heavy
    schedules (hoisted BSGS, rotate_sum) hit the same (n, g) pairs every
    call; rebuilding the index array per call cost host time each.

    Deliberately NOT a device array: materializing on device inside a jit
    trace would cache a tracer (the int64→int32 canonicalization is a traced
    op) and leak it into later traces. A dtype-canonical numpy constant is
    safe in any trace context — ``jnp.take`` embeds it as a jaxpr const.
    """
    return np.ascontiguousarray(galois_dual_perm(n, galois_element),
                                dtype=np.int32)


def naive_negacyclic_mul(a: np.ndarray, b: np.ndarray, p: int) -> np.ndarray:
    """O(n²) schoolbook negacyclic convolution over Python ints.

    Test oracle mirroring the reference's no-ψ fallback
    (``pow2_cyc_rings.jl:150-165``).
    """
    n = len(a)
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        for j in range(n):
            k = i + j
            t = ai * int(b[j])
            if k < n:
                out[k] = (out[k] + t) % p
            else:
                out[k - n] = (out[k - n] - t) % p
    return np.array(out, dtype=np.uint32)
