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

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import modmath
from ..ops.modmath import U32
from ..ops.ntt import NttTables, _mont_mul_raw, _add_raw, _sub_raw


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


def _dft_stages_p(x, tw_list, p, ninv, bitrev):
    n = x.shape[-1]
    lead = x.shape[:-1]
    p3 = p[..., None]
    ninv3 = ninv[..., None]
    x = jnp.take(x, bitrev, axis=-1)
    ln = 2
    for s in range(n.bit_length() - 1):
        half = ln // 2
        xs = x.reshape(lead + (n // ln, ln))
        u = xs[..., :half]
        v = _mont_mul_raw(xs[..., half:], tw_list[s], p3, ninv3)
        x = jnp.concatenate([_add_raw(u, v, p3), _sub_raw(u, v, p3)], axis=-1)
        x = x.reshape(lead + (n,))
        ln *= 2
    return x


def ntt_p(x, tabs: dict):
    """Forward negacyclic NTT on uint32[..., L, N] with tables-as-arrays
    (shardable along L)."""
    x = _mont_mul_pt(x, tabs["psi_pow"], tabs)
    return _dft_stages_p(x, tabs["tw"], tabs["p"], tabs["ninv"], tabs["bitrev"])


def intt_p(x, tabs: dict):
    x = _dft_stages_p(x, tabs["twi"], tabs["p"], tabs["ninv"], tabs["bitrev"])
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


def keyswitch_digits_local(c_end, gather, tabs, window: int):
    """Inside-shard_map body for gadget decomposition: each shard owns
    L_loc limbs of c_end; ``gather`` must have already all-gathered the
    full-L centered lifts. Returns digit duals for the local limbs:
    uint32[ndig, L_loc, N]."""
    # gather: int32[L_full, N] centered lifts (replicated after all_gather)
    p = tabs["p"]                  # (L_loc, 1)
    local = modmath.from_signed(
        jnp.broadcast_to(gather[:, None, :], gather.shape[:1] + (p.shape[0], gather.shape[1])),
        _mk_mp(tabs))
    return ntt_p(local, tabs)


def _mk_mp(tabs):
    import dataclasses

    from ..ops.modmath import MontParams
    L = tabs["p"].shape[0]
    z = jnp.zeros_like(tabs["p"])
    return MontParams(p=tabs["p"], ninv=tabs["ninv"], r2=z, r1=z,
                      half=(tabs["p"] - 1) // 2)
