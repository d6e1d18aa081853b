"""MXU (systolic-array) negacyclic NTT — the four-step formulation.

The radix-2 NTT is VPU-compute-bound on TPU: every butterfly is a ~20-op
uint32 Montgomery multiply built from 16-bit partial products, and the
measured throughput sits at the integer-ALU roofline, ~50× short of HBM.
The MXU does 128×128 int8 MACs at hundreds of TOPS — so the TPU-native
NTT moves the O(N·128) work there.

Four-step decomposition, N = N1·N2 (N1 = 128 = the MXU tile edge):

    j = j1·N2 + j2,  k = k1 + N1·k2
    A[k1, j2] = Σ_{j1} Xmat[j1, j2] · ω_{N1}^{j1·k1}        (matmul, MXU)
    B[k1, j2] = A[k1, j2] · ω_N^{k1·j2}                      (twiddle, VPU)
    C[k2, k1] = Σ_{j2} B[k1, j2] · ω_{N2}^{j2·k2}            (matmul, MXU)
    X[k1 + N1·k2] = C[k2, k1]  — flattening C is already natural order.

Exact modular matmuls on the MXU: operands are decomposed into four
**balanced base-256 digits** (each in [−128, 127], fits int8); each digit
pair multiplies exactly in int8→int32 MXU dots, and the 7 shifted
digit-diagonals recombine on the VPU with a 64-bit (hi,lo) accumulation
and two Montgomery reductions per element. Works for primes < 2^30.

The ψ-twist/untwist and negacyclic semantics are identical to ops/ntt.py
(reference nntt/inntt, pow2_cyc_rings.jl:295-318); outputs are bit-exact,
natural order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import modmath
from .modmath import U32, MontParams, mul32
from .ntt import NttTables, _to_mont_np

N1 = 128           # MXU tile edge
_NDIG = 4
_OFF = 1 << 23


def lane_optimal_n1(n: int) -> int:
    """Four-step stage-1 edge that puts 128 in the MINOR dim (n2) so
    every in-kernel elementwise pass fills the 128-wide VPU lane tile.
    Measured 4.0× on chip at N=2^13 vs the n1=128 default
    (tools/bench_mfu_levers.py, docs/performance.md round 5). At
    N ≥ 2^14 the default n1=128 already has n2 ≥ 128."""
    if n % 128 == 0 and n < 16384:
        return max(2, n // 128)
    return N1


def _build_mat(p: int, w: int, rows: int, cols: int) -> np.ndarray:
    """M[i, j] = w^{i·j} mod p as an object matrix (host, setup only)."""
    out = np.zeros((rows, cols), dtype=object)
    wr = 1
    for i in range(rows):
        v = 1
        for j in range(cols):
            out[i, j] = v
            v = v * wr % p
        wr = wr * w % p
    return out


def _balanced_digits_host(M: np.ndarray) -> np.ndarray:
    """object matrix -> int8[4, ...] balanced base-256 digits (values must
    be < 2^30 so four digits suffice)."""
    digs = []
    cur = M.astype(object)
    for _ in range(_NDIG):
        r = np.vectorize(lambda x: int(x) & 255)(cur).astype(np.int64)
        r = np.where(r >= 128, r - 256, r)
        cur = (cur - r) // 256
        digs.append(r.astype(np.int8))
    assert np.all(np.vectorize(int)(cur) == 0), "prime too large for 4 digits"
    return np.stack(digs, 0)


class MxuNttTables:
    """Digit-decomposed DFT matrices + twiddles for the four-step NTT.

    ``n1`` is the stage-1 edge (N = n1·n2). The default 128 matches the
    MXU tile; `TOYFHE_MXU_N1` overrides it. At N < 2^14 the default
    leaves n2 < 128 — a minor dim narrower than the 128-wide VPU lane
    tile, so EVERY in-kernel elementwise op runs on padded lanes;
    choosing n1 = N/128 (n2 = 128) fills the lanes instead (the round-5
    in-kernel MFU lever; A/B: tools/bench_mfu_levers.py)."""

    def __init__(self, tables: NttTables, n1: int = None):
        import os as _os

        n = tables.n
        if n1 is None:
            n1 = int(_os.environ.get("TOYFHE_MXU_N1", 0)) or N1
        assert n % n1 == 0 and n >= n1 and n1 <= 128
        for p in tables.primes:
            assert p < (1 << 30), "MXU path requires primes < 2^30"
        n2 = n // n1
        self.n, self.n1, self.n2 = n, n1, n2
        self.primes = tables.primes
        self.mp = tables.mp
        L = len(tables.primes)
        self.psi_pow = tables.psi_pow          # (L, N) Montgomery
        self.psi_ipow = tables.psi_ipow

        self.w1 = np.zeros((L, _NDIG, n1, n1), dtype=np.int8)
        self.w1i = np.zeros((L, _NDIG, n1, n1), dtype=np.int8)
        self.w2 = np.zeros((L, _NDIG, n2, n2), dtype=np.int8)
        self.w2i = np.zeros((L, _NDIG, n2, n2), dtype=np.int8)
        self.tw = np.zeros((L, n1, n2), dtype=np.uint32)
        self.twi = np.zeros((L, n1, n2), dtype=np.uint32)
        for l, (p, psi) in enumerate(zip(tables.primes, tables.psis)):
            omega = psi * psi % p
            iomega = pow(omega, -1, p)
            self.w1[l] = _balanced_digits_host(_build_mat(p, pow(omega, n2, p), n1, n1))
            self.w1i[l] = _balanced_digits_host(_build_mat(p, pow(iomega, n2, p), n1, n1))
            self.w2[l] = _balanced_digits_host(_build_mat(p, pow(omega, n1, p), n2, n2))
            self.w2i[l] = _balanced_digits_host(_build_mat(p, pow(iomega, n1, p), n2, n2))
            self.tw[l] = _to_mont_np(_build_mat(p, omega, n1, n2), p)
            self.twi[l] = _to_mont_np(_build_mat(p, iomega, n1, n2), p)

        # digit-recombination constants (plain residues): c_s = 2^{8s} mod p
        cs = np.zeros((2 * _NDIG - 1, L, 1, 1), dtype=np.uint32)
        corr = np.zeros((L, 1, 1), dtype=np.uint32)
        r1m = np.zeros((L, 1, 1), dtype=np.uint32)
        him = np.zeros((L, 1, 1), dtype=np.uint32)
        for l, p in enumerate(tables.primes):
            tot = 0
            for s in range(2 * _NDIG - 1):
                cval = (1 << (8 * s)) % p
                cs[s, l] = cval
                tot += _OFF * cval
            corr[l] = tot % p
            r1m[l] = (1 << 32) % p             # mont_mul(lo, R mod p) = lo mod p
            him[l] = pow(2, 64, p)             # mont_mul(hi, R² mod p) = hi·2^32 mod p
        self.cs, self.corr = cs, corr
        self.r1_mont, self.hi_mont = r1m, him

        # paired-diagonal recombination constants: weights 2^{16t} for the
        # folded groups G'ₜ = G₂ₜ + 256·G₂ₜ₊₁ (t=0,1 are exact shifts;
        # t=2,3 need reduced constants), plus the 2^31-offset correction.
        cs32 = np.zeros((L, 1, 1), dtype=np.uint32)
        cs48 = np.zeros((L, 1, 1), dtype=np.uint32)
        corr2 = np.zeros((L, 1, 1), dtype=np.uint32)
        for l, p in enumerate(tables.primes):
            c32, c48 = pow(2, 32, p), pow(2, 48, p)
            cs32[l], cs48[l] = c32, c48
            corr2[l] = ((1 << 31) % p) * (1 + (1 << 16) + c32 + c48) % p
        self.cs32, self.cs48, self.corr2 = cs32, cs48, corr2
        self.paired_ok = all(
            self._paired_bound(w) < (1 << 31)
            for w in (self.w1, self.w1i, self.w2, self.w2i))

    def cached(self, name: str, build):
        """Per-table memo for derived numpy arrays: a FRESH numpy object
        per call becomes a fresh jaxpr constant per trace site — caching
        keeps one object, so XLA sees one (deduped) constant."""
        key = "_memo_" + name
        if not hasattr(self, key):
            setattr(self, key, build())
        return getattr(self, key)

    @staticmethod
    def _paired_bound(w: np.ndarray) -> int:
        """Max possible |G'ₜ| = |G₂ₜ + 256·G₂ₜ₊₁| over the folded
        diagonal groups for digit matrix w: int8[L, 4, K, J] against
        worst-case x digits (|x| ≤ 128)."""
        colsum = np.abs(w.astype(np.int64)).sum(axis=2)      # (L, 4, J)
        smax = []
        for s in range(2 * _NDIG - 1):
            tot = sum(colsum[:, d] for d in range(_NDIG)
                      if 0 <= s - d < _NDIG)
            smax.append(int(tot.max()) * 128)
        return max(smax[2 * t] + 256 * smax[2 * t + 1] for t in range(3))

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


class MxuRowView:
    """Row-sliced view of a full-tower :class:`MxuNttTables`.

    The big per-limb arrays (digit matrices, twiddles, ψ powers) stay on
    the ROOT object — every derived tower level embeds the SAME root
    constant in compiled programs and selects its rows in-jit — while
    the small per-limb recombination constants are materialized eagerly.
    Legacy consumers that read the big arrays directly (sharding table
    pytrees) get lazily-materialized numpy slices via ``__getattr__``.
    """

    _BIG = ("w1", "w1i", "w2", "w2i", "tw", "twi", "psi_pow", "psi_ipow")

    def __init__(self, root: MxuNttTables, rows):
        self.root = root
        self.rows = tuple(int(r) for r in rows)
        idx = np.asarray(self.rows)
        self.n, self.n1, self.n2 = root.n, root.n1, root.n2
        self.primes = [root.primes[i] for i in self.rows]
        self.mp = root.mp.select(idx)
        self.cs = root.cs[:, idx]
        self.corr = root.corr[idx]
        self.r1_mont = root.r1_mont[idx]
        self.hi_mont = root.hi_mont[idx]
        self.cs32, self.cs48 = root.cs32[idx], root.cs48[idx]
        self.corr2 = root.corr2[idx]
        self.paired_ok = root.paired_ok    # subset bound ≤ root bound

    def cached(self, name: str, build):
        key = "_memo_" + name
        if not hasattr(self, key):
            setattr(self, key, build())
        return getattr(self, key)

    def __getattr__(self, name):
        if name in MxuRowView._BIG:
            arr = getattr(self.root, name)[np.asarray(self.rows)]
            object.__setattr__(self, name, arr)
            return arr
        raise AttributeError(name)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _balanced_digits_device(x):
    """uint32[...] -> int8[4, ...] balanced base-256 digits."""
    digs = []
    cur = x.astype(jnp.int32)
    for _ in range(_NDIG):
        r = cur & 255
        r = jnp.where(r >= 128, r - 256, r)
        cur = (cur - r) >> 8
        digs.append(r.astype(jnp.int8))
    return jnp.stack(digs, 0)


def _mp3(mp: MontParams) -> MontParams:
    return MontParams(p=mp.p[..., None], ninv=mp.ninv[..., None],
                     r2=mp.r2[..., None], r1=mp.r1[..., None],
                     half=mp.half[..., None])


def _mod_matmul_c(digits_x, w_digits, cs, r1_mont, hi_mont, corr, mp3):
    """out[..., l, j, c] = Σ_k W[l, k, j]·X[..., l, k, c] mod p, with the
    digit-recombination constants passed explicitly (so shard_map can
    partition them along the limb axis).

    digits_x: int8[4, ..., L, K, C]; w_digits: int8[L, 4, K, J].
    W matrices here are symmetric (Vandermonde of ω on both indices), so
    this computes the DFT along the K axis.
    """
    groups = [None] * (2 * _NDIG - 1)
    for d in range(_NDIG):
        for e in range(_NDIG):
            P = jnp.einsum("lkj,...lkc->...ljc", w_digits[:, d], digits_x[e],
                           preferred_element_type=jnp.int32)
            s = d + e
            groups[s] = P if groups[s] is None else groups[s] + P
    hi = lo = None
    for s in range(2 * _NDIG - 1):
        H = (groups[s] + jnp.int32(_OFF)).astype(U32)        # < 2^24
        h, l = mul32(H, cs[s])
        if hi is None:
            hi, lo = h, l
        else:
            nl = lo + l
            hi = hi + h + (nl < lo).astype(U32)
            lo = nl
    t1 = modmath.mont_mul(lo, r1_mont, mp3)
    t2 = modmath.mont_mul(hi, hi_mont, mp3)
    v = modmath.add_mod(t1, t2, mp3)
    return modmath.sub_mod(v, jnp.broadcast_to(corr, v.shape), mp3)


def _mod_matmul(mt: MxuNttTables, digits_x, w_digits, mp3):
    """See :func:`_mod_matmul_c`; constants taken from ``mt``."""
    return _mod_matmul_c(digits_x, w_digits, jnp.asarray(mt.cs),
                         jnp.asarray(mt.r1_mont), jnp.asarray(mt.hi_mont),
                         jnp.asarray(mt.corr), mp3)


def _four_step(mt: MxuNttTables, x, w1, w2, twiddle, psi, pre: bool):
    n, n2 = mt.n, mt.n2
    mp = mt.mp
    mp3 = _mp3(mp)
    lead = x.shape[:-2]
    L = x.shape[-2]
    if pre:
        x = modmath.mont_mul(x, jnp.asarray(psi), mp)
    xm = x.reshape(lead + (L, mt.n1, n2))                    # Xmat[j1, j2]
    a = _mod_matmul(mt, _balanced_digits_device(xm), jnp.asarray(w1), mp3)
    b = modmath.mont_mul(a, jnp.asarray(twiddle), mp3)       # ⊙ ω^{k1·j2}
    bt = jnp.swapaxes(b, -1, -2)                             # [..., L, j2, k1]
    c = _mod_matmul(mt, _balanced_digits_device(bt), jnp.asarray(w2), mp3)
    out = c.reshape(lead + (L, n))                           # [k2, k1] → natural
    if not pre:
        out = modmath.mont_mul(out, jnp.asarray(psi), mp)
    return out


def ntt_mxu(mt: MxuNttTables, x):
    """Forward negacyclic NTT (natural order) — MXU four-step."""
    return _four_step(mt, x, mt.w1, mt.w2, mt.tw, mt.psi_pow, pre=True)


def intt_mxu(mt: MxuNttTables, x):
    """Inverse negacyclic NTT (natural order) — MXU four-step."""
    return _four_step(mt, x, mt.w1i, mt.w2i, mt.twi, mt.psi_ipow, pre=False)
