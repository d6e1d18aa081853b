"""Ring layer (L1): power-of-two negacyclic rings over RNS towers.

TPU-native redesign of the reference's ``NegacyclicRing{F,N}`` +
``RingElement`` (``/root/reference/src/pow2_cyc_rings.jl:27-145``) and the
``CRTEncoded`` residue towers (``/root/reference/src/crt.jl``): the
StructArrays struct-of-arrays layout becomes an explicit dense tensor axis
— a ring element is ``uint32[L, N]`` (RNS limbs × coefficients), and all
tower metadata (primes, ψ roots, Montgomery constants, twiddles) is static
host data baked into compiled programs.

The reference's lazy primal/dual caching (``pow2_cyc_rings.jl:93-138``)
survives as an immutable two-slot pytree: a :class:`RingElt` carries
``primal`` (coefficient domain) and/or ``dual`` (NTT/evaluation domain);
``ensure_primal`` / ``ensure_dual`` return a new element with the missing
view computed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import modmath, ntt as nttmod
from ..ops.modmath import MontParams
from ..utils import numtheory as nt

__all__ = ["RingContext", "RingElt", "make_ring", "make_rns_ring"]


class RingContext:
    """Static description of 𝔽q[x]/(x^N+1) with an RNS tower of primes.

    Identity-hashed so it can be a jit static argument; construct once per
    parameter set (use :func:`make_rns_ring` / ``select``/``drop_last`` for
    derived towers — they are cached and share limb data).
    """

    def __init__(self, n: int, primes: Sequence[int], psis: Optional[Sequence[int]] = None):
        self.n = int(n)
        self.primes = [int(p) for p in primes]
        self.tables = nttmod.NttTables(self.n, self.primes, psis)
        self.mp: MontParams = self.tables.mp
        self.psis = self.tables.psis
        self._children: dict = {}
        self._rescale_cache: dict = {}
        self._galois_cache: dict = {}
        # canonicalization: derived towers are cached on the ROOT ring by
        # absolute limb indices, so e.g. drop_last() of a special-prime-
        # expanded tower IS the original ciphertext tower (identity
        # equality is what jit static args and ct_stack compare).
        self._root: "RingContext" = self
        self._root_indices = tuple(range(len(self.primes)))

    # ---- identity hashing for jit static args ----
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return f"RingContext(N={self.n}, L={self.nlimbs}, logq≈{self.log2q:.1f})"

    @property
    def nlimbs(self) -> int:
        return len(self.primes)

    @property
    def modulus(self) -> int:
        """Full composite modulus q = ∏ q_i as a Python int."""
        return math.prod(self.primes)

    @property
    def log2q(self) -> float:
        return sum(math.log2(p) for p in self.primes)

    # ---- derived towers (crtselect / drop_last, crt.jl:185-213) ----
    def select(self, which: Sequence[int]) -> "RingContext":
        key = tuple(self._root_indices[int(i)] for i in which)
        root = self._root
        if key == root._root_indices:
            return root
        if key not in root._children:
            child = RingContext(
                self.n, [root.primes[i] for i in key],
                [root.psis[i] for i in key])
            child._root = root
            child._root_indices = key
            # root linkage on the NTT tables: lets the MXU path embed ONE
            # full-tower table constant shared by every derived tower and
            # slice rows in-jit (ops/ntt.py::_mxu_tables row views) — at
            # production N the per-level table constants otherwise sum to
            # hundreds of MB per compiled program
            child.tables.root_tables = root.tables
            child.tables.root_rows = key
            root._children[key] = child
        return root._children[key]

    def drop_last(self) -> "RingContext":
        return self.select(range(self.nlimbs - 1))

    # ---- rescale constants (modswitch, crt.jl:215-220) ----
    def rescale_consts(self):
        """(q_last mod q_j, q_last^{-1} mod q_j in Montgomery form) for the
        surviving limbs j < L-1."""
        if "rescale" not in self._rescale_cache:
            qk = self.primes[-1]
            surv = self.primes[:-1]
            qk_mod = np.array([[qk % p] for p in surv], dtype=np.uint32)
            inv_m = np.array(
                [[pow(qk, -1, p) * (1 << 32) % p] for p in surv], dtype=np.uint64
            ).astype(np.uint32)
            self._rescale_cache["rescale"] = (qk_mod, inv_m)
        return self._rescale_cache["rescale"]

    def galois_tables(self, g: int):
        g = int(g)
        if g not in self._galois_cache:
            self._galois_cache[g] = nttmod.galois_perm_tables(self.n, g)
        return self._galois_cache[g]

    # ---- native host runtime (C++ CRT decode paths) ----
    def native(self):
        """CrtNative for this tower, or None if the toolchain is absent."""
        if "native" not in self._rescale_cache:
            try:
                from ..native import CrtNative
                self._rescale_cache["native"] = CrtNative(self.primes)
            except Exception:
                self._rescale_cache["native"] = None
        return self._rescale_cache["native"]

    # ---- host-side exact CRT (debug/decode path) ----
    def to_bigint(self, primal: np.ndarray) -> list:
        """CRT-reconstruct uint32[L, N] residues to Python ints in [0, q)."""
        q = self.modulus
        acc = [0] * primal.shape[-1]
        for l, p in enumerate(self.primes):
            qhat = q // p
            corr = nt.invmod(qhat, p)
            row = primal[l].astype(object)
            for j in range(primal.shape[-1]):
                acc[j] += (int(row[j]) * corr % p) * qhat
        return [a % q for a in acc]

    def from_bigint(self, values: Sequence[int]) -> np.ndarray:
        """Python ints → uint32[L, N] residues."""
        out = np.zeros((self.nlimbs, len(values)), dtype=np.uint32)
        for l, p in enumerate(self.primes):
            out[l] = np.array([int(v) % p for v in values], dtype=np.uint64).astype(np.uint32)
        return out

    def scalar_residues(self, value: int) -> np.ndarray:
        """Python int → per-limb residue column uint32[L, 1]."""
        return np.array([[int(value) % p] for p in self.primes], dtype=np.uint64).astype(np.uint32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RingElt:
    """Element of a negacyclic RNS ring: uint32[..., L, N] in one or both
    domains (reference ``RingElement`` lazy primal/dual pair)."""

    primal: Optional[jnp.ndarray] = None
    dual: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        children, keys = [], []
        if self.primal is not None:
            children.append(self.primal)
            keys.append("primal")
        if self.dual is not None:
            children.append(self.dual)
            keys.append("dual")
        return children, tuple(keys)

    @classmethod
    def tree_unflatten(cls, keys, children):
        kw = dict(zip(keys, children))
        return cls(**kw)

    @property
    def shape(self):
        arr = self.primal if self.primal is not None else self.dual
        return arr.shape


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------

def make_ring(n: int, primes: Sequence[int]) -> RingContext:
    return RingContext(n, primes)


def make_rns_ring(n: int, logqs: Sequence[int]) -> RingContext:
    """RNS ring from requested limb bit-sizes (reference RNS ring ctor,
    crt.jl:282-295), with primes ≡ 1 (mod 2N) found by the same walk."""
    return RingContext(n, nt.ntt_prime_chain(n, logqs))


def zero(ring: RingContext, batch: Tuple[int, ...] = ()) -> RingElt:
    return RingElt(primal=jnp.zeros(batch + (ring.nlimbs, ring.n), dtype=jnp.uint32))


def zero_like(ring: RingContext, x: RingElt) -> RingElt:
    arr = x.primal if x.primal is not None else x.dual
    z = jnp.zeros_like(arr)
    return RingElt(primal=z, dual=z)


# ---------------------------------------------------------------------------
# domain management (lazy primal/dual — pow2_cyc_rings.jl:124-138)
# ---------------------------------------------------------------------------

def ensure_primal(ring: RingContext, x: RingElt) -> RingElt:
    if x.primal is not None:
        return x
    from ..utils import metrics
    metrics.count("ntt_limb_transform", int(np.prod(x.dual.shape[:-1])))
    return RingElt(primal=nttmod.intt(ring.tables, x.dual), dual=x.dual)


def ensure_dual(ring: RingContext, x: RingElt) -> RingElt:
    if x.dual is not None:
        return x
    from ..utils import metrics
    metrics.count("ntt_limb_transform", int(np.prod(x.primal.shape[:-1])))
    return RingElt(primal=x.primal, dual=nttmod.ntt(ring.tables, x.primal))


# ---------------------------------------------------------------------------
# arithmetic (pow2_cyc_rings.jl:147-219)
# ---------------------------------------------------------------------------

def add(ring: RingContext, a: RingElt, b: RingElt) -> RingElt:
    return _addsub(ring, a, b, modmath.add_mod)


def sub(ring: RingContext, a: RingElt, b: RingElt) -> RingElt:
    return _addsub(ring, a, b, modmath.sub_mod)


def _addsub(ring: RingContext, a: RingElt, b: RingElt, op) -> RingElt:
    mp = ring.mp
    primal = dual = None
    if a.primal is not None and b.primal is not None:
        primal = op(a.primal, b.primal, mp)
    if a.dual is not None and b.dual is not None:
        dual = op(a.dual, b.dual, mp)
    if primal is None and dual is None:
        # mixed domains: canonicalize through dual (ciphertext home domain)
        a2, b2 = ensure_dual(ring, a), ensure_dual(ring, b)
        dual = op(a2.dual, b2.dual, mp)
    return RingElt(primal=primal, dual=dual)


def neg(ring: RingContext, a: RingElt) -> RingElt:
    mp = ring.mp
    return RingElt(
        primal=None if a.primal is None else modmath.neg_mod(a.primal, mp),
        dual=None if a.dual is None else modmath.neg_mod(a.dual, mp))


def mul(ring: RingContext, a: RingElt, b: RingElt) -> RingElt:
    """Ring product: pointwise in the evaluation domain (ring_multiply,
    pow2_cyc_rings.jl:147-169; NTT path only — pow2 rings always have ψ)."""
    a2, b2 = ensure_dual(ring, a), ensure_dual(ring, b)
    return RingElt(dual=modmath.mul_mod(a2.dual, b2.dual, ring.mp))


def scalar_mul(ring: RingContext, s, a: RingElt) -> RingElt:
    """Multiply by a scalar given as per-limb residues uint32[L, 1] (or an
    int, converted on host). Linear: applies in whichever domains exist."""
    if isinstance(s, (int, np.integer)):
        s = ring.scalar_residues(int(s))
    s = jnp.asarray(s)
    mp = ring.mp
    return RingElt(
        primal=None if a.primal is None else modmath.mul_mod(a.primal, s, mp),
        dual=None if a.dual is None else modmath.mul_mod(a.dual, s, mp))


def apply_galois(ring: RingContext, a: RingElt, galois_element: int) -> RingElt:
    """x(X) ↦ x(X^g) — primal-domain permutation (pow2_cyc_rings.jl:321-329)."""
    src, negm = ring.galois_tables(galois_element)
    a = ensure_primal(ring, a)
    return RingElt(primal=nttmod.apply_galois(ring.mp, a.primal, src, negm))


# ---------------------------------------------------------------------------
# RNS tower ops (crt.jl:215-244)
# ---------------------------------------------------------------------------

def limb_select(ring: RingContext, a: RingElt, which: Sequence[int]) -> Tuple[RingContext, RingElt]:
    """crtselect: restrict to a sub-tower (crt.jl:185-211)."""
    idx = jnp.asarray(list(which))
    sub = ring.select(which)
    take = lambda arr: None if arr is None else jnp.take(arr, idx, axis=-2)
    return sub, RingElt(primal=take(a.primal), dual=take(a.dual))


def modswitch_drop(ring: RingContext, a: RingElt) -> Tuple[RingContext, RingElt]:
    """Drop the last limb without rescaling (crt.jl:222-235)."""
    return limb_select(ring, a, range(ring.nlimbs - 1))


def rescale(ring: RingContext, a: RingElt) -> Tuple[RingContext, RingElt]:
    """Exact divide-and-round by the last prime (modswitch, crt.jl:215-220):
    for surviving limb j:  a'_j = q_k^{-1} · (a_j − [a_k]_{q_j}) mod q_j.

    Matches the reference in using the raw (non-centered) representative of
    the dropped limb.
    """
    a = ensure_primal(ring, a)
    sub = ring.drop_last()
    _, inv_m = ring.rescale_consts()
    last = a.primal[..., -1:, :]                      # [..., 1, N] residues mod q_k
    surv = a.primal[..., :-1, :]
    mp = sub.mp
    last_mod = modmath.umod(last, jnp.asarray(mp.p))     # raw [a_k] reduced mod q_j
    diff = modmath.sub_mod(surv, last_mod, mp)
    out = modmath.mont_mul(diff, jnp.asarray(inv_m), mp)  # inv stored in Montgomery form
    return sub, RingElt(primal=out)


def rescale_dual(ring: RingContext, a: RingElt) -> Tuple[RingContext, RingElt]:
    """Fused dual-domain rescale: bit-identical to :func:`rescale` (NTT
    is linear and exact: NTT(b) = a_dual·q_k^{-1} − NTT([a_k]·q_k^{-1}))
    but pays INTT for ONE row + NTT for L−1 rows instead of a full-tower
    INTT followed by a re-NTT when the consumer needs the dual — the
    key-switch contract hot path."""
    from ..ops import ntt as nttmod
    from ..utils import metrics
    assert a.dual is not None
    sub = ring.drop_last()
    _, inv_m = ring.rescale_consts()
    inv_m = jnp.asarray(inv_m)
    last_ring = ring.select([ring.nlimbs - 1])
    l = nttmod.intt(last_ring.tables, a.dual[..., -1:, :])   # raw residues
    metrics.count("ntt_limb_transform", int(np.prod(l.shape[:-1])))
    mp = sub.mp
    corr = modmath.mont_mul(modmath.umod(l, mp.p), inv_m, mp)
    corr_dual = nttmod.ntt(sub.tables, corr)
    metrics.count("ntt_limb_transform", int(np.prod(corr.shape[:-1])))
    out = modmath.sub_mod(
        modmath.mont_mul(a.dual[..., :-1, :], inv_m, mp), corr_dual, mp)
    return sub, RingElt(dual=out)


def rescale_adapted(ring: RingContext, a: RingElt, t: int
                    ) -> Tuple[RingContext, RingElt]:
    """BGV-correct divide-and-round by the last prime: the correction
    term d is chosen ≡ a mod q_k AND ≡ 0 mod t (the plaintext modulus),
    so (a − d)/q_k keeps the noise ≡ 0 mod t — the low plaintext digits
    survive the division. d = r + q_k·v with r the centered last-limb
    residue and v ≡ −r·q_k⁻¹ (mod t), centered; ‖d‖ ≤ q_k(t + 1)/2.
    Message is multiplied by q_k⁻¹ mod t (track, or use q_k ≡ 1 mod t).
    Beyond the reference: ToyFHE's modswitch (crt.jl:215-220) is
    CKKS/BFV-only rounding, never composed with BGV."""
    a = ensure_primal(ring, a)
    sub = ring.drop_last()
    qk = ring.primes[-1]
    qk_mod, inv_m = ring.rescale_consts()
    mp = sub.mp
    t = int(t)
    if not (1 < t < (1 << 20)):
        raise ValueError("rescale_adapted needs a plaintext modulus < 2^20")
    last = a.primal[..., -1:, :]
    last_mp = ring.mp.select([ring.nlimbs - 1])
    r = modmath.centered(last, last_mp)                  # int32 (−q_k/2, q_k/2]
    # v ≡ −r·q_k⁻¹ (mod t), centered in (−t/2, t/2]; the product is
    # assembled from 16-bit halves so t up to 2^20 cannot overflow int32
    neg_inv = (t - pow(qk, -1, t) % t) % t
    r_t = jnp.mod(r, jnp.int32(t)).astype(jnp.uint32)    # [0, t)
    hi, lo = modmath.mul32(r_t, jnp.uint32(neg_inv))
    vin = modmath.umod(modmath.umod(hi * np.uint32(((1 << 32) % t)), t)
                       + modmath.umod(lo, t), t)
    v = jnp.where(vin > t // 2, vin.astype(jnp.int32) - t,
                  vin.astype(jnp.int32))
    # d_j = (r + q_k·v) mod q_j assembled from uint32 modular pieces
    rj = modmath.from_signed(r, mp)
    vj = modmath.from_signed(v, mp)
    dj = modmath.add_mod(rj, modmath.mul_mod(jnp.asarray(qk_mod), vj, mp), mp)
    diff = modmath.sub_mod(a.primal[..., :-1, :], dj, mp)
    return sub, RingElt(primal=modmath.mont_mul(diff, jnp.asarray(inv_m), mp))
