"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the shard_map residue-parallel pipeline (square → relin →
rescale) is bit-identical to the sequential engine, and that NTT tables
shard cleanly along the limb axis.
"""

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import ring as ringops
from toyfhe_tpu.parallel import ops as pops
from toyfhe_tpu.parallel import sharding as S


@pytest.fixture(scope="module")
def setup():
    N, L, B = 64, 4, 2
    ring = F.make_rns_ring(N, (30, 29, 29, 28))
    params = F.CKKSParams(ring, 0, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    vals = np.linspace(0.1, 1.0, N // 2)
    scale = Fraction(2) ** 45
    cts = []
    for i, k in enumerate(jax.random.split(ks[2], B)):
        cts.append(F.encrypt(kp, F.make_plaintext(ring, vals * (i + 1), scale), k))
    return ring, params, kp, ek, cts, vals, scale


def _ct_duals(ring, c):
    return jnp.stack([ringops.ensure_dual(ring, x).dual for x in c.cs], 0)


def _key_stacks(ring, ek):
    masks = jnp.stack([ringops.ensure_dual(ring, kc.mask).dual for kc in ek.key.key], 0)
    maskeds = jnp.stack([ringops.ensure_dual(ring, kc.masked).dual for kc in ek.key.key], 0)
    return masks, maskeds


def test_sharded_step_matches_sequential(setup):
    ring, params, kp, ek, cts, vals, scale = setup
    mesh = S.make_mesh(n_rp=4, n_dp=2)
    masks, maskeds = _key_stacks(ring, ek)
    step, place = pops.make_sharded_step(mesh, ring.tables, masks, maskeds)

    batch = jnp.stack([_ct_duals(ring, c) for c in cts], 0)   # [B,2,L,N]
    out = np.asarray(step(place(batch)))

    for i, c in enumerate(cts):
        seq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
        seq_duals = np.asarray(_ct_duals(seq.ring, seq))      # [2, L-1, N]
        np.testing.assert_array_equal(out[i][:, :ring.nlimbs - 1, :], seq_duals)
        assert np.all(out[i][:, -1, :] == 0)                  # dropped limb zeroed


@pytest.fixture(scope="module")
def hybrid_setup():
    N, B = 64, 4
    # 6 ct limbs (3 groups of 2) + 2 replicated raising primes
    ring = F.make_rns_ring(N, (28,) * 6 + (30, 30))
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), dnum=3,
                            num_special=2)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    vals = np.linspace(0.1, 1.0, N // 2)
    scale = Fraction(2) ** 26
    cts = [F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals * (i + 1),
                                          scale), k)
           for i, k in enumerate(jax.random.split(ks[2], B))]
    return params, kp, ek, cts, vals, scale


def test_hybrid_sharded_step_matches_sequential(hybrid_setup):
    """rp-sharded hybrid (dnum-grouped) square→relin→rescale is
    bit-identical to the eager engine — the FBC ŷ premultiply is
    shard-local, specials are replicated, same two collective sites as
    the per-limb step with dnum digit batches instead of L."""
    params, kp, ek, cts, vals, scale = hybrid_setup
    ring = params.ring_cipher
    # 2-limb shards: the size-2 limb groups straddle shard boundaries
    mesh = S.make_mesh(n_rp=2, n_dp=4)
    step, place = pops.make_hybrid_sharded_step(mesh, params, ek)
    batch = jnp.stack([_ct_duals(ring, c) for c in cts], 0)
    out = np.asarray(step(place(batch)))

    for i, c in enumerate(cts):
        seq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
        seq_duals = np.asarray(_ct_duals(seq.ring, seq))
        np.testing.assert_array_equal(out[i][:, :ring.nlimbs - 1, :],
                                      seq_duals)
        assert np.all(out[i][:, -1, :] == 0)


def test_hybrid_single_chip_step_matches(hybrid_setup):
    params, kp, ek, cts, vals, scale = hybrid_setup
    ring = params.ring_cipher
    step, place = pops.make_hybrid_sharded_step(None, params, ek)
    batch = jnp.stack([_ct_duals(ring, c) for c in cts], 0)
    out = np.asarray(step(place(batch)))
    seq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(cts[0], cts[0])))
    np.testing.assert_array_equal(out[0][:, :ring.nlimbs - 1, :],
                                  np.asarray(_ct_duals(seq.ring, seq)))


def test_hybrid_fused_step_matches(hybrid_setup):
    """The fused-schedule single-chip step (in-group digit reuse +
    dual-domain ModDown + folded final rescale) is BIT-identical to the
    eager engine — the fold is an algebraic refactoring of the same
    exact modular arithmetic."""
    params, kp, ek, cts, vals, scale = hybrid_setup
    ring = params.ring_cipher
    step, place = pops.make_hybrid_fused_step(params, ek)
    batch = jnp.stack([_ct_duals(ring, c) for c in cts], 0)
    out = np.asarray(step(place(batch)))
    for i, c in enumerate(cts):
        seq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
        seq_duals = np.asarray(_ct_duals(seq.ring, seq))
        np.testing.assert_array_equal(out[i][:, :ring.nlimbs - 1, :],
                                      seq_duals)
        assert np.all(out[i][:, -1, :] == 0)


def test_hybrid_fused_sharded_step_matches(hybrid_setup):
    """The FUSED schedule under rp-sharding (round-3 VERDICT item 3):
    in-group digit reuse via per-shard gather indices + dual-domain
    ModDown with replicated special rows — bit-identical to both the
    eager engine and the v1 sharded schedule, with shard boundaries
    deliberately straddling the dnum groups."""
    params, kp, ek, cts, vals, scale = hybrid_setup
    ring = params.ring_cipher
    mesh = S.make_mesh(n_rp=2, n_dp=4)
    step, place = pops.make_hybrid_sharded_step(mesh, params, ek,
                                                fused_schedule=True)
    batch = jnp.stack([_ct_duals(ring, c) for c in cts], 0)
    out = np.asarray(step(place(batch)))

    for i, c in enumerate(cts):
        seq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
        seq_duals = np.asarray(_ct_duals(seq.ring, seq))
        np.testing.assert_array_equal(out[i][:, :ring.nlimbs - 1, :],
                                      seq_duals)
        assert np.all(out[i][:, -1, :] == 0)


def test_hybrid_fused_sharded_step_3shards(hybrid_setup):
    """Same A/B at n_rp=3 — shards own 2 limbs each while the dnum=3
    groups own 2, so group↔shard alignment both coincides and straddles
    depending on the row; exercises the per-shard index paths."""
    params, kp, ek, cts, vals, scale = hybrid_setup
    ring = params.ring_cipher
    mesh = S.make_mesh(n_rp=3, n_dp=1, devices=jax.devices()[:3])
    step, place = pops.make_hybrid_sharded_step(mesh, params, ek,
                                                fused_schedule=True)
    batch = jnp.stack([_ct_duals(ring, c) for c in cts], 0)
    out = np.asarray(step(place(batch)))
    seq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(cts[0], cts[0])))
    np.testing.assert_array_equal(out[0][:, :ring.nlimbs - 1, :],
                                  np.asarray(_ct_duals(seq.ring, seq)))


def test_sharded_step_decrypts(setup):
    ring, params, kp, ek, cts, vals, scale = setup
    mesh = S.make_mesh(n_rp=4, n_dp=2)
    masks, maskeds = _key_stacks(ring, ek)
    step, place = pops.make_sharded_step(mesh, ring.tables, masks, maskeds)
    batch = jnp.stack([_ct_duals(ring, c) for c in cts], 0)
    out = np.asarray(step(place(batch)))

    sub = ring.drop_last()
    new_scale = scale * scale / ring.primes[-1]
    for i in range(len(cts)):
        cs = tuple(F.RingElt(dual=jnp.asarray(out[i][j][:ring.nlimbs - 1]))
                   for j in range(2))
        c = F.CipherText(params, cs, sub, enc=F.CKKSTag(new_scale))
        got = F.decrypt(kp, c).real
        expect = (vals * (i + 1)) ** 2
        np.testing.assert_allclose(got, expect, atol=2e-4)


def test_ntt_tables_shard(setup):
    """Per-limb NTT with tables sharded over 'rp' equals unsharded."""
    ring, *_ = setup
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = S.make_mesh(n_rp=4, n_dp=2)
    tabs = S.ntt_table_pytree(ring.tables)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 2 ** 28, (ring.nlimbs, ring.n)).astype(np.uint32))
    f = shard_map(lambda a, t: S.ntt_p(a, t), mesh=mesh,
                  in_specs=(P("rp", None), S.table_specs()),
                  out_specs=P("rp", None), check_vma=False)
    got = np.asarray(jax.jit(f)(x, tabs))
    from toyfhe_tpu.ops import ntt as nttmod
    expect = np.asarray(nttmod.ntt(ring.tables, x))
    np.testing.assert_array_equal(got, expect)


def test_ntt_p_lazy_bitexact():
    """Harvey lazy path of the shardable NTT matches the exact path."""
    import toyfhe_tpu as F
    from toyfhe_tpu.ops import ntt as nttmod

    ring = F.make_rns_ring(128, (28, 27))     # all primes < 2^30
    assert ring.tables.lazy_ok
    tabs = S.ntt_table_pytree(ring.tables)
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.stack([rng.integers(0, p, 128, dtype=np.uint32)
                              for p in ring.primes]))
    a = np.asarray(S.ntt_p(x, tabs, lazy=True))
    b = np.asarray(S.ntt_p(x, tabs, lazy=False))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, np.asarray(nttmod.ntt(ring.tables, x)))
    ia = np.asarray(S.intt_p(x, tabs, lazy=True))
    np.testing.assert_array_equal(ia, np.asarray(nttmod.intt(ring.tables, x)))
