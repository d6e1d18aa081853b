"""Fused MXU hybrid key-switch core (ops/pallas_hybrid_ks.py):
bit-exactness vs the unfused engine schedule, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import ring as R
from toyfhe_tpu.core import rlwe
from toyfhe_tpu.ops import modmath
from toyfhe_tpu.ops import ntt as nttmod


def _setup(n=256, L=4, dnum=2, k=2, seed=0):
    ring = F.make_rns_ring(n, tuple([28] * L + [29] * k))
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), dnum, k)
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    return ring, params, kp, ek


@pytest.mark.slow
def test_fused_matches_unfused():
    from toyfhe_tpu.ops.pallas_hybrid_ks import FusedHybridKS

    ring, params, kp, ek = _setup()
    ct_ring = params.ring_cipher
    n, L0 = ct_ring.n, ct_ring.nlimbs
    rng = np.random.default_rng(3)
    xp = jnp.asarray(np.stack(
        [rng.integers(0, p, size=n, dtype=np.int64)
         for p in ct_ring.primes]).astype(np.uint32))

    # unfused engine path: decompose -> batched NTT -> key contraction
    exp_ring, digits = params.hybrid_decompose(ct_ring, R.RingElt(primal=xp))
    ddual = nttmod.ntt(exp_ring.tables, digits)
    masks, maskeds = rlwe._hybrid_key_stack(params, ek.key, exp_ring,
                                            int(digits.shape[0]), 0)
    mp = exp_ring.mp
    want1 = np.asarray(rlwe._mod_sum(modmath.mul_mod(maskeds, ddual, mp), mp))
    want2 = np.asarray(rlwe._mod_sum(modmath.mul_mod(masks, ddual, mp), mp))

    fks = FusedHybridKS(params, ek)
    y = fks.premultiply(xp)
    acc1, acc2 = fks(y, interpret=True)
    np.testing.assert_array_equal(np.asarray(acc1), want1)
    np.testing.assert_array_equal(np.asarray(acc2), want2)


@pytest.mark.slow
def test_fused_batched_and_short_tower():
    from toyfhe_tpu.ops.pallas_hybrid_ks import FusedHybridKS

    ring, params, kp, ek = _setup(n=256, L=5, dnum=2, k=3, seed=1)
    ct_ring = params.ring_cipher
    # shortened tower: last group shrinks (alpha padding path)
    lt = 4
    sub = ct_ring.select(list(range(lt)))
    n = ct_ring.n
    rng = np.random.default_rng(5)
    xp = jnp.asarray(rng.integers(0, min(sub.primes),
                                  size=(2, lt, n)).astype(np.uint32))

    exp_ring, digits = params.hybrid_decompose(sub, R.RingElt(primal=xp))
    ddual = nttmod.ntt(exp_ring.tables, digits)
    masks, maskeds = rlwe._hybrid_key_stack(params, ek.key, exp_ring,
                                            int(digits.shape[0]),
                                            ddual.ndim - 3)
    mp = exp_ring.mp
    want1 = np.asarray(rlwe._mod_sum(modmath.mul_mod(maskeds, ddual, mp), mp))
    want2 = np.asarray(rlwe._mod_sum(modmath.mul_mod(masks, ddual, mp), mp))

    fks = FusedHybridKS(params, ek, lt=lt)
    acc1, acc2 = fks(fks.premultiply(xp), interpret=True)
    np.testing.assert_array_equal(np.asarray(acc1), want1)
    np.testing.assert_array_equal(np.asarray(acc2), want2)


@pytest.mark.slow
def test_fused_full_step_matches():
    """make_hybrid_sharded_step(fused=True): the whole square→relin→
    rescale step is bit-exact vs the unfused schedule."""
    from toyfhe_tpu.parallel import ops as pops

    ring, params, kp, ek = _setup(n=256, L=4, dnum=2, k=2, seed=2)
    ct_ring = params.ring_cipher
    rng = np.random.default_rng(7)
    batch = jnp.asarray(rng.integers(
        0, min(ct_ring.primes),
        (2, 2, ct_ring.nlimbs, ct_ring.n)).astype(np.uint32))
    step0, _ = pops.make_hybrid_sharded_step(None, params, ek)
    step1, _ = pops.make_hybrid_sharded_step(None, params, ek, fused=True)
    np.testing.assert_array_equal(np.asarray(step0(batch)),
                                  np.asarray(step1(batch)))
