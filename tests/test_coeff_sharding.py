"""Coefficient-axis (sequence-parallel) sharded NTT on the virtual mesh.

The transpose-based four-step transform with coefficients sharded over a
'cp' axis must match the single-device radix-2 NTT exactly, modulo the
documented shard layouts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from toyfhe_tpu.ops import ntt as nttmod
from toyfhe_tpu.ops import ntt_mxu as mxu
from toyfhe_tpu.parallel import sharding as S
from toyfhe_tpu.utils import numtheory as nt


@pytest.mark.parametrize("nshards", [2, 4, 8])
def test_coeff_sharded_forward(nshards):
    n, L = 1024, 2
    t = nttmod.NttTables(n, nt.ntt_prime_chain(n, (29, 28)))
    mt = mxu.MxuNttTables(t)
    assert mt.n2 % nshards == 0 and (n // mt.n2) % nshards == 0

    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, p, n, dtype=np.uint32) for p in t.primes])

    in_src, out_nat = S.coeff_shard_layout(n, mt.n2, nshards)
    x_layout = x[:, in_src]                       # distribute this along N

    devs = np.asarray(jax.devices()[:nshards])
    mesh = Mesh(devs, ("cp",))
    body = S.coeff_sharded_ntt_fn(mt, nshards)
    f = shard_map(body, mesh=mesh, in_specs=P(None, "cp"),
                  out_specs=P(None, "cp"), check_vma=False)
    got_layout = np.asarray(jax.jit(f)(jnp.asarray(x_layout)))

    # un-permute the output layout back to natural dual order
    got = np.zeros_like(got_layout)
    got[:, out_nat] = got_layout
    expect = np.asarray(nttmod.ntt(t, jnp.asarray(x)))
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("nshards", [2, 4])
def test_coeff_sharded_roundtrip(nshards):
    """Sharded forward then sharded inverse == identity (and matches the
    single-device transforms), one all_to_all each way."""
    n, L = 1024, 2
    t = nttmod.NttTables(n, nt.ntt_prime_chain(n, (29, 28)))
    mt = mxu.MxuNttTables(t)
    rng = np.random.default_rng(1)
    x = np.stack([rng.integers(0, p, n, dtype=np.uint32) for p in t.primes])
    in_src, out_nat = S.coeff_shard_layout(n, mt.n2, nshards)
    x_layout = x[:, in_src]

    devs = np.asarray(jax.devices()[:nshards])
    mesh = Mesh(devs, ("cp",))
    fwd = shard_map(S.coeff_sharded_ntt_fn(mt, nshards), mesh=mesh,
                    in_specs=P(None, "cp"), out_specs=P(None, "cp"),
                    check_vma=False)
    inv = shard_map(S.coeff_sharded_intt_fn(mt, nshards), mesh=mesh,
                    in_specs=P(None, "cp"), out_specs=P(None, "cp"),
                    check_vma=False)
    dual_layout = jax.jit(fwd)(jnp.asarray(x_layout))
    back = np.asarray(jax.jit(inv)(dual_layout))
    # roundtrip identity in the sharded layout
    np.testing.assert_array_equal(back, x_layout)

    # and the sharded dual really is the single-device dual (so the
    # inverse consumed a genuine transform, not a fixed point)
    dual_nat = np.zeros_like(x)
    dual_nat[:, out_nat] = np.asarray(dual_layout)
    np.testing.assert_array_equal(
        np.asarray(nttmod.intt(t, jnp.asarray(dual_nat))), x)


@pytest.mark.parametrize("nshards,element", [(2, 3), (4, 3), (8, 3**5),
                                             (4, 2 * 1024 - 1)])
def test_coeff_sharded_galois(nshards, element):
    """Galois permutation under coefficient sharding (one padded
    all_to_all) == the single-device gather (apply_galois), in the
    four-step input layout."""
    n, L = 1024, 2
    t = nttmod.NttTables(n, nt.ntt_prime_chain(n, (29, 28)))
    mt = mxu.MxuNttTables(t)
    rng = np.random.default_rng(2)
    x = np.stack([rng.integers(0, p, n, dtype=np.uint32) for p in t.primes])

    src, neg = nttmod.galois_perm_tables(n, element)
    expect = np.asarray(nttmod.apply_galois(t.mp, jnp.asarray(x), src, neg))

    in_src, _ = S.coeff_shard_layout(n, mt.n2, nshards)
    x_layout = x[:, in_src]
    devs = np.asarray(jax.devices()[:nshards])
    mesh = Mesh(devs, ("cp",))
    body = S.coeff_sharded_galois_fn(mt, nshards, element)
    f = shard_map(body, mesh=mesh, in_specs=P(None, "cp"),
                  out_specs=P(None, "cp"), check_vma=False)
    got_layout = np.asarray(jax.jit(f)(jnp.asarray(x_layout)))
    np.testing.assert_array_equal(got_layout, expect[:, in_src])
