"""Mesh sharding for RNS FHE — the parallelism the reference never had.

SURVEY §2.9/§5.8: the reference is single-core serial; its latent
parallel axes become first-class here:

  * **residue parallelism (RP)** — shard the RNS limb axis ``L`` across
    chips ('rp' mesh axis). Limb ops (NTT, pointwise ct arithmetic) are
    embarrassingly parallel (crt.jl:247-275); cross-limb communication
    happens only at the reference's collective sites: key-switch digit
    sharing (rlwe_she.jl:340-344 → all_gather of centered digit lifts),
    and rescale's dropped-limb broadcast (crt.jl:215-220 → all_gather of
    one limb row).
  * **ciphertext/batch parallelism (DP)** — shard a leading batch axis
    ('dp'), e.g. the 49-ciphertext MNIST grid (infer.jl:115-124).

Everything here operates on raw ``uint32[..., L, N]`` tensors plus a
pytree of NTT/rescale tables, so ``shard_map`` can slice the limb axis of
both data and tables together.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import modmath

from ..ops.ntt import (NttTables, _mont_mul_raw, _mont_mul_lazy, _add_raw,
                       _sub_raw)


# ---------------------------------------------------------------------------
# table pytrees (shardable along the limb axis)
# ---------------------------------------------------------------------------

def ntt_table_pytree(tables: NttTables) -> dict:
    """NTT constants as a pytree of arrays, limb axis leading, so shard_map
    partitions them alongside the data."""
    L = len(tables.primes)
    return {
        "p": jnp.asarray(tables.mp.p),                    # (L,1)
        "ninv": jnp.asarray(tables.mp.ninv),
        "psi_pow": jnp.asarray(tables.psi_pow),           # (L,N)
        "psi_ipow": jnp.asarray(tables.psi_ipow),
        "tw": tuple(jnp.asarray(t) for t in tables.stage_tw),      # (L,1,half)
        "twi": tuple(jnp.asarray(t) for t in tables.stage_tw_inv),
        "bitrev": jnp.asarray(tables.bitrev),             # (N,) replicated
    }


def table_specs(batch_dims: int = 0) -> dict:
    """PartitionSpecs matching ntt_table_pytree, limb axis -> 'rp'."""
    return {
        "p": P("rp", None),
        "ninv": P("rp", None),
        "psi_pow": P("rp", None),
        "psi_ipow": P("rp", None),
        "tw": P("rp", None, None),
        "twi": P("rp", None, None),
        "bitrev": P(None),
    }


def _dft_stages_p(x, tw_list, p, ninv, bitrev, lazy=False):
    """Radix-2 stages; with ``lazy=True`` (all primes < 2^30, decided
    statically at build time) uses Harvey lazy butterflies — one
    conditional per butterfly, values in [0, 4p), final correction."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    p3 = p[..., None]
    ninv3 = ninv[..., None]
    two_p = p3 + p3
    x = jnp.take(x, bitrev, axis=-1)
    ln = 2
    for s in range(n.bit_length() - 1):
        half = ln // 2
        xs = x.reshape(lead + (n // ln, ln))
        u = xs[..., :half]
        v = xs[..., half:]
        if lazy:
            u = jnp.where(u >= two_p, u - two_p, u)
            t = _mont_mul_lazy(v, tw_list[s], p3, ninv3)
            x = jnp.concatenate([u + t, u + two_p - t], axis=-1)
        else:
            t = _mont_mul_raw(v, tw_list[s], p3, ninv3)
            x = jnp.concatenate([_add_raw(u, t, p3), _sub_raw(u, t, p3)],
                                axis=-1)
        x = x.reshape(lead + (n,))
        ln *= 2
    if lazy:
        tp2 = p + p
        x = jnp.where(x >= tp2, x - tp2, x)
        x = jnp.where(x >= p, x - p, x)
    return x


def ntt_p(x, tabs: dict, lazy: bool = False):
    """Forward negacyclic NTT on uint32[..., L, N] with tables-as-arrays
    (shardable along L)."""
    x = _mont_mul_pt(x, tabs["psi_pow"], tabs)
    return _dft_stages_p(x, tabs["tw"], tabs["p"], tabs["ninv"],
                         tabs["bitrev"], lazy)


def intt_p(x, tabs: dict, lazy: bool = False):
    x = _dft_stages_p(x, tabs["twi"], tabs["p"], tabs["ninv"],
                      tabs["bitrev"], lazy)
    return _mont_mul_pt(x, tabs["psi_ipow"], tabs)


def _mont_mul_pt(a, b, tabs):
    return _mont_mul_raw(a, b, tabs["p"], tabs["ninv"])


# ---------------------------------------------------------------------------
# mesh + sharded primitive ops
# ---------------------------------------------------------------------------

def make_mesh(n_rp: Optional[int] = None, n_dp: int = 1,
              devices=None) -> Mesh:
    """('dp', 'rp') device mesh. Defaults to all devices on 'rp'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_rp is None:
        n_rp = devices.size // n_dp
    return Mesh(devices.reshape(n_dp, n_rp), ("dp", "rp"))


def shard_ring_tensor(mesh: Mesh, x, batch: bool = False):
    """Place uint32[..., L, N] with L on 'rp' (and axis 0 on 'dp' if
    batch)."""
    spec = (P("dp", None, "rp", None) if batch else P("rp", None))
    return jax.device_put(x, NamedSharding(mesh, spec))


# ---------------------------------------------------------------------------
# coefficient-axis (sequence-parallel) sharded NTT
# ---------------------------------------------------------------------------
#
# The ring-dimension axis N is the FHE analogue of sequence parallelism
# (SURVEY §5): for N too large for one chip, shard the coefficient axis
# over a 'cp' mesh axis. The transpose-based four-step factorization
# N = N1·N2 localizes both DFT stages around ONE all_to_all:
#
#   Xmat[j1, j2] = x[j1·N2 + j2]      sharded along j2
#   A = W_{N1} · Xmat                  (contraction over j1 — local)
#   B = A ⊙ ω^{k1·j2}                  (local)
#   all_to_all: reshard from j2-sharded to k1-sharded
#   C = B · W_{N2}                     (contraction over j2 — local)
#   X[k1 + N1·k2] = C[k1, k2]          sharded along k1
#
# The modular matmuls reuse the MXU digit-dot machinery (ops/ntt_mxu.py),
# so on TPU the sharded transform also rides the systolic array.

def coeff_shard_layout(n: int, n2: int, nshards: int):
    """Host-side index maps for the sharded four-step layout.

    Input layout: shard s owns columns j2 ∈ [s·n2/C, (s+1)·n2/C) of
    Xmat[j1, j2] (j = j1·n2 + j2); locally (j1-major, j2loc-minor).
    ``in_src[pos]`` gives the natural coefficient index stored at global
    position pos of the concatenated shard layout (a gather map).

    Output layout: shard s owns k1 ∈ [s·N1/C, ...), locally (k2-major,
    k1loc-minor). ``out_nat[pos]`` gives the natural dual index stored at
    global position pos.
    """
    N1 = n // n2
    npb = n2 // nshards
    k1pb = N1 // nshards
    pos = np.arange(n)
    # input gather map
    shard = pos // (n // nshards)
    within = pos % (n // nshards)
    j1 = within // npb
    j2 = shard * npb + within % npb
    in_src = j1 * n2 + j2
    # output natural-index map
    shard_o = pos // (n // nshards)
    within_o = pos % (n // nshards)
    k2 = within_o // k1pb
    k1 = shard_o * k1pb + within_o % k1pb
    out_nat = k1 + N1 * k2
    return in_src, out_nat


def coeff_sharded_ntt_fn(mxu_tables, nshards: int, axis_name: str = "cp"):
    """shard_map body for the forward negacyclic NTT with the coefficient
    axis sharded over ``axis_name`` (transpose-based four-step: both DFT
    stages local, ONE all_to_all between them).

    The body takes ``x_local: uint32[L, N/C]`` in the layout described by
    :func:`coeff_shard_layout` and returns the dual in the output layout.
    The ψ-twist table is pre-permuted to the input layout so each shard
    slices its contiguous block. (Inverse transform mirrors this with the
    inverse tables and the layouts swapped — planned follow-up.)
    """
    from ..ops import modmath as MM
    from ..ops import ntt_mxu as MX

    mt = mxu_tables
    n, n2, N1 = mt.n, mt.n2, MX.N1
    npb = n2 // nshards
    mp = mt.mp
    mp3 = MX._mp3(mp)
    w1 = jnp.asarray(mt.w1)
    w2 = jnp.asarray(mt.w2)
    tw = jnp.asarray(mt.tw)
    in_src, _ = coeff_shard_layout(n, n2, nshards)
    psi_layout = jnp.asarray(np.asarray(mt.psi_pow)[:, in_src])  # (L, N) permuted

    def body(x_local):
        idx = jax.lax.axis_index(axis_name)
        nloc = x_local.shape[-1]
        psi_loc = jax.lax.dynamic_slice_in_dim(psi_layout, idx * nloc, nloc, 1)
        x_local = MM.mont_mul(x_local, psi_loc, mp)
        xm = x_local.reshape(x_local.shape[:-1] + (N1, npb))
        # stage 1 (local): A[k1, j2loc] = Σ_j1 W1[j1, k1]·X[j1, j2loc]
        a = MX._mod_matmul(mt, MX._balanced_digits_device(xm), w1, mp3)
        # twiddle ω^{k1·j2} for my j2 block
        twl = jax.lax.dynamic_slice_in_dim(tw, idx * npb, npb, 2)
        b = MM.mont_mul(a, twl, mp3)
        # ONE all_to_all: j2-sharded -> k1-sharded (split N1, concat j2)
        bt = jax.lax.all_to_all(b, axis_name, split_axis=b.ndim - 2,
                                concat_axis=b.ndim - 1, tiled=True)
        # bt: (L, N1/C, n2) with full j2
        btt = jnp.swapaxes(bt, -1, -2)                 # (L, j2, k1loc)
        c = MX._mod_matmul(mt, MX._balanced_digits_device(btt), w2, mp3)
        # c: (L, k2, k1loc) -> flatten to the output layout
        return c.reshape(c.shape[:-2] + (n2 * (N1 // nshards),))

    return body


def coeff_sharded_galois_plan(n: int, n2: int, nshards: int,
                              galois_element: int):
    """Host-side routing plan for the galois permutation x(X) ↦ x(X^g)
    (reference ``apply_galois_element``, pow2_cyc_rings.jl:321-329) on
    PRIMAL coefficients stored in :func:`coeff_shard_layout`'s *input*
    layout (j2-sharded, j1-major locally).

    Key structural fact: with j = j1·n2 + j2 and src[j] = g⁻¹·j mod n,
    src[j] mod n2 = (g⁻¹ mod n2)·j2 mod n2 — the source *column* depends
    only on the destination column. The permutation therefore routes whole
    columns (N1 elements each) between shards, and one padded
    ``all_to_all`` + a local gather realizes it exactly. Communication is
    C·B columns per shard where B = max columns any (src, dst) pair
    exchanges; for well-mixed g this is ≈ npb/C (optimal), degrading
    toward an all_gather only when g⁻¹ ≡ ±1 mod n2 concentrates a block.

    Returns (send_idx[C, C, B] int32 local column indices to ship,
    recv_map[C, Nloc] int32 flat gather into the (N1, C·B) receive buffer,
    neg_mask[C, Nloc] bool sign flips, B).
    """
    from ..ops.ntt import galois_perm_tables

    src, neg = galois_perm_tables(n, galois_element)
    N1 = n // n2
    npb = n2 // nshards
    nloc = n // nshards
    # column map: dst column j2 ← src column col_src[j2] (whole column)
    col_src = src[np.arange(n2)] % n2
    assert np.all(src.reshape(N1, n2) % n2 == col_src), \
        "galois source column must be constant per destination column"
    # send lists per (src shard t, dst shard s)
    lists = [[[] for _ in range(nshards)] for _ in range(nshards)]
    for s in range(nshards):
        for j2loc in range(npb):
            j2s = int(col_src[s * npb + j2loc])
            lists[j2s // npb][s].append(j2s % npb)
    for t in range(nshards):
        for s in range(nshards):
            lists[t][s] = sorted(set(lists[t][s]))
    B = max(1, max(len(lists[t][s]) for t in range(nshards)
                   for s in range(nshards)))
    send_idx = np.zeros((nshards, nshards, B), dtype=np.int32)
    for t in range(nshards):
        for s in range(nshards):
            row = lists[t][s] or [0]
            row = row + [row[-1]] * (B - len(row))
            send_idx[t, s] = row
    # receive-side gather: dst shard s, local pos (j1-major, j2loc)
    recv_map = np.zeros((nshards, nloc), dtype=np.int32)
    neg_mask = np.zeros((nshards, nloc), dtype=bool)
    for s in range(nshards):
        for pos in range(nloc):
            j1, j2loc = divmod(pos, npb)
            j = j1 * n2 + (s * npb + j2loc)
            i = int(src[j])
            j1s, j2s = divmod(i, n2)
            t, cloc = divmod(j2s, npb)
            b = lists[t][s].index(cloc)
            recv_map[s, pos] = j1s * (nshards * B) + t * B + b
            neg_mask[s, pos] = neg[j]
    return send_idx, recv_map, neg_mask, B


def coeff_sharded_galois_fn(mxu_tables, nshards: int, galois_element: int,
                            axis_name: str = "cp"):
    """shard_map body applying a galois permutation (with sign flips) to
    uint32[..., L, N/C] primal coefficients in the four-step input layout,
    using ONE padded all_to_all (see :func:`coeff_sharded_galois_plan`).

    Completes the SURVEY §5 sequence-parallel story: slot rotations under
    coefficient sharding are cross-shard index permutations.
    """
    mt = mxu_tables
    n, n2 = mt.n, mt.n2
    N1 = n // n2
    npb = n2 // nshards
    mp = mt.mp
    send_idx, recv_map, neg_mask, B = coeff_sharded_galois_plan(
        n, n2, nshards, galois_element)
    send_c = jnp.asarray(send_idx)
    recv_c = jnp.asarray(recv_map)
    neg_c = jnp.asarray(neg_mask)

    def body(x_local):
        me = jax.lax.axis_index(axis_name)
        lead = x_local.shape[:-1]
        xm = x_local.reshape(lead + (N1, npb))
        sidx = jax.lax.dynamic_slice_in_dim(send_c, me, 1, 0)[0]   # (C, B)
        send = jnp.take(xm, sidx.reshape(-1), axis=-1)
        send = send.reshape(lead + (N1, nshards, B))
        recv = jax.lax.all_to_all(send, axis_name,
                                  split_axis=len(lead) + 1,
                                  concat_axis=len(lead) + 2, tiled=True)
        flat = recv.reshape(lead + (N1 * nshards * B,))
        ridx = jax.lax.dynamic_slice_in_dim(recv_c, me, 1, 0)[0]   # (Nloc,)
        y = jnp.take(flat, ridx, axis=-1)
        negm = jax.lax.dynamic_slice_in_dim(neg_c, me, 1, 0)[0]
        return jnp.where(negm, modmath.neg_mod(y, mp), y)

    return body


def coeff_sharded_intt_fn(mxu_tables, nshards: int, axis_name: str = "cp"):
    """shard_map body for the INVERSE coefficient-sharded transform: takes
    the dual in :func:`coeff_shard_layout`'s output layout (k1-sharded,
    k2-major) and returns coefficients in the input layout (j2-sharded,
    j1-major) — the exact mirror of :func:`coeff_sharded_ntt_fn`, again
    with ONE all_to_all between two local modular-matmul stages.
    """
    from ..ops import modmath as MM
    from ..ops import ntt_mxu as MX

    mt = mxu_tables
    n, n2, N1 = mt.n, mt.n2, MX.N1
    npb = n2 // nshards
    k1pb = N1 // nshards
    mp = mt.mp
    mp3 = MX._mp3(mp)
    w1i = jnp.asarray(mt.w1i)
    w2i = jnp.asarray(mt.w2i)
    twi = jnp.asarray(mt.twi)
    in_src, _ = coeff_shard_layout(n, n2, nshards)
    ipsi_layout = jnp.asarray(np.asarray(mt.psi_ipow)[:, in_src])

    def body(y_local):
        idx = jax.lax.axis_index(axis_name)
        nloc = y_local.shape[-1]
        # out layout: (k2-major, k1loc) for my k1 block
        ym = y_local.reshape(y_local.shape[:-1] + (n2, k1pb))
        # stage 1 (local): D[j2, k1loc] = Σ_{k2} W2⁻¹[k2, j2]·Y[k2, k1loc]
        d = MX._mod_matmul(mt, MX._balanced_digits_device(ym), w2i, mp3)
        # inverse twiddle ω^{-k1·j2} for my k1 block: (L, j2, k1loc)
        twl = jax.lax.dynamic_slice_in_dim(twi, idx * k1pb, k1pb, 1)
        d = MM.mont_mul(d, jnp.swapaxes(twl, -1, -2), mp3)
        # ONE all_to_all: k1-sharded -> j2-sharded (split j2, concat k1)
        e = jax.lax.all_to_all(d, axis_name, split_axis=d.ndim - 2,
                               concat_axis=d.ndim - 1, tiled=True)
        # e: (L, n2/C, N1) = [j2loc, k1] with full k1
        et = jnp.swapaxes(e, -1, -2)                  # (L, k1, j2loc)
        # stage 2 (local): X[j1, j2loc] = Σ_{k1} W1⁻¹[k1, j1]·E[k1, j2loc]
        x = MX._mod_matmul(mt, MX._balanced_digits_device(et), w1i, mp3)
        out = x.reshape(x.shape[:-2] + (N1 * npb,))
        ipsi_loc = jax.lax.dynamic_slice_in_dim(ipsi_layout, idx * nloc,
                                                nloc, 1)
        return MM.mont_mul(out, ipsi_loc, mp)

    return body
