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


def shard_limbwise(tree, mesh: Mesh, axis_name: str = "rp"):
    """Commit every array leaf of a pytree (keys, ciphertexts, whole
    BootstrapContexts) to ``mesh`` with its LIMB axis — axis −2 of the
    (..., L, N) ring-tensor layout — sharded over ``axis_name`` wherever
    the extent divides, replicated otherwise.

    This is the residue-parallel placement for ENGINE pytrees: a
    ``jax.jit`` of an engine function (e.g. ``core.bootstrap.bootstrap``)
    over leaves committed this way compiles one GSPMD program whose
    keyswitch contractions and per-limb transforms are limb-local, with
    XLA inserting the cross-limb collectives (FBC gather, ModDown
    broadcast — SURVEY §5.8 sites). Exact modular arithmetic makes the
    partitioned program bit-identical to the single-device one."""
    size = mesh.shape[axis_name]

    def put(x):
        if not hasattr(x, "ndim"):
            return x
        spec = [None] * x.ndim
        if x.ndim >= 2 and x.shape[-2] % size == 0:
            spec[-2] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


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


def _ct_local_slices(ct_full: dict, nshards: int, axis_name: str):
    """Slice the cp-dependent entries of a full :func:`mxu_table_pytree`
    down to this shard's block (for single-'cp'-axis use where the
    tables are closed-over constants rather than shard_map operands)."""
    idx = jax.lax.axis_index(axis_name)
    npb = ct_full["tw"].shape[-1] // nshards
    k1pb = ct_full["twi"].shape[-2] // nshards
    nloc = ct_full["psi"].shape[-1] // nshards
    ct = dict(ct_full)
    ct["psi"] = jax.lax.dynamic_slice_in_dim(ct_full["psi"], idx * nloc,
                                             nloc, 1)
    ct["ipsi"] = jax.lax.dynamic_slice_in_dim(ct_full["ipsi"], idx * nloc,
                                              nloc, 1)
    ct["tw"] = jax.lax.dynamic_slice_in_dim(ct_full["tw"], idx * npb, npb, 2)
    ct["twi"] = jax.lax.dynamic_slice_in_dim(ct_full["twi"], idx * k1pb,
                                             k1pb, 1)
    return ct


def coeff_sharded_ntt_fn(mxu_tables, nshards: int, axis_name: str = "cp"):
    """shard_map body for the forward negacyclic NTT with the coefficient
    axis sharded over ``axis_name`` (transpose-based four-step: both DFT
    stages local, ONE all_to_all between them).

    The body takes ``x_local: uint32[..., L, N/C]`` in the layout
    described by :func:`coeff_shard_layout` and returns the dual in the
    output layout. Tables are closed-over constants; the per-shard blocks
    are dynamic-sliced by shard index (see :func:`mxu2_ntt_local` for the
    tables-as-operands flavor used by the 2-axis keyswitch)."""
    ct_full = mxu_table_pytree(mxu_tables, nshards)

    def body(x_local):
        return mxu2_ntt_local(x_local,
                              _ct_local_slices(ct_full, nshards, axis_name),
                              axis_name)

    return body


def mxu_table_pytree(mxu_tables, nshards: int) -> dict:
    assert getattr(mxu_tables, "n1", 128) == 128, \
        "coeff-sharded four-step assumes the n1=128 factorization"
    """Four-step NTT constants as a pytree shardable over BOTH the limb
    axis ('rp') and the coefficient axis ('cp') — the table side of the
    2-axis sharded transform. ψ tables are pre-permuted into the
    :func:`coeff_shard_layout` input layout so a plain 'cp' partition
    hands each shard its contiguous block."""
    mt = mxu_tables
    in_src, _ = coeff_shard_layout(mt.n, mt.n2, nshards)
    mp = mt.mp
    return {
        "p": jnp.asarray(mp.p), "ninv": jnp.asarray(mp.ninv),
        "r2": jnp.asarray(mp.r2), "r1": jnp.asarray(mp.r1),
        "half": jnp.asarray(mp.half),
        "cs": jnp.asarray(mt.cs), "corr": jnp.asarray(mt.corr),
        "r1m": jnp.asarray(mt.r1_mont), "him": jnp.asarray(mt.hi_mont),
        "w1": jnp.asarray(mt.w1), "w1i": jnp.asarray(mt.w1i),
        "w2": jnp.asarray(mt.w2), "w2i": jnp.asarray(mt.w2i),
        "tw": jnp.asarray(mt.tw), "twi": jnp.asarray(mt.twi),
        "psi": jnp.asarray(np.asarray(mt.psi_pow)[:, in_src]),
        "ipsi": jnp.asarray(np.asarray(mt.psi_ipow)[:, in_src]),
    }


def mxu_table_specs() -> dict:
    """PartitionSpecs for :func:`mxu_table_pytree`: limb axis → 'rp';
    the j2-indexed tables (tw, ψ) → 'cp'; twi is k1-indexed → 'cp' on
    its k1 axis."""
    return {
        "p": P("rp", None), "ninv": P("rp", None),
        "r2": P("rp", None), "r1": P("rp", None), "half": P("rp", None),
        "cs": P(None, "rp", None, None), "corr": P("rp", None, None),
        "r1m": P("rp", None, None), "him": P("rp", None, None),
        "w1": P("rp", None, None, None), "w1i": P("rp", None, None, None),
        "w2": P("rp", None, None, None), "w2i": P("rp", None, None, None),
        "tw": P("rp", None, "cp"), "twi": P("rp", "cp", None),
        "psi": P("rp", "cp"), "ipsi": P("rp", "cp"),
    }


def _mp_local(ct) -> modmath.MontParams:
    return modmath.MontParams(p=ct["p"], ninv=ct["ninv"], r2=ct["r2"],
                              r1=ct["r1"], half=ct["half"])


def mxu2_ntt_local(x, ct: dict, axis_name: str = "cp"):
    """Forward four-step negacyclic NTT with ALL tables already local
    (shard_map body helper): x uint32[..., Lloc, Nloc] primal in the
    input layout → dual in the output layout. ONE all_to_all over
    ``axis_name``."""
    from ..ops import ntt_mxu as MX

    mpl = _mp_local(ct)
    mp3 = MX._mp3(mpl)
    x = modmath.mont_mul(x, ct["psi"], mpl)
    lead = x.shape[:-1]
    npb = ct["tw"].shape[-1]
    xm = x.reshape(lead + (MX.N1, npb))
    a = MX._mod_matmul_c(MX._balanced_digits_device(xm), ct["w1"],
                         ct["cs"], ct["r1m"], ct["him"], ct["corr"], mp3)
    b = modmath.mont_mul(a, ct["tw"], mp3)
    bt = jax.lax.all_to_all(b, axis_name, split_axis=b.ndim - 2,
                            concat_axis=b.ndim - 1, tiled=True)
    btt = jnp.swapaxes(bt, -1, -2)
    c = MX._mod_matmul_c(MX._balanced_digits_device(btt), ct["w2"],
                         ct["cs"], ct["r1m"], ct["him"], ct["corr"], mp3)
    return c.reshape(c.shape[:-2] + (c.shape[-2] * c.shape[-1],))


def mxu2_intt_local(y, ct: dict, axis_name: str = "cp"):
    """Inverse of :func:`mxu2_ntt_local` (output layout → input layout),
    again ONE all_to_all."""
    from ..ops import ntt_mxu as MX

    mpl = _mp_local(ct)
    mp3 = MX._mp3(mpl)
    lead = y.shape[:-1]
    n2 = ct["w2"].shape[-1]
    k1pb = y.shape[-1] // n2
    ym = y.reshape(lead + (n2, k1pb))
    d = MX._mod_matmul_c(MX._balanced_digits_device(ym), ct["w2i"],
                         ct["cs"], ct["r1m"], ct["him"], ct["corr"], mp3)
    d = modmath.mont_mul(d, jnp.swapaxes(ct["twi"], -1, -2), mp3)
    e = jax.lax.all_to_all(d, axis_name, split_axis=d.ndim - 2,
                           concat_axis=d.ndim - 1, tiled=True)
    et = jnp.swapaxes(e, -1, -2)
    x = MX._mod_matmul_c(MX._balanced_digits_device(et), ct["w1i"],
                         ct["cs"], ct["r1m"], ct["him"], ct["corr"], mp3)
    out = x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
    return modmath.mont_mul(out, ct["ipsi"], mpl)


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
    ct_full = mxu_table_pytree(mxu_tables, nshards)

    def body(y_local):
        return mxu2_intt_local(y_local,
                               _ct_local_slices(ct_full, nshards, axis_name),
                               axis_name)

    return body
