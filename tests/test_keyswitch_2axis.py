"""2-axis ('rp' × 'cp') sharded keyswitch on the virtual 8-device mesh.

The square→relinearize→rescale step with RNS limbs sharded over 'rp'
AND coefficients sharded over 'cp' (four-step layout) must be
bit-identical to the single-chip step (itself validated against the
sequential engine in test_parallel.py).
"""

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import toyfhe_tpu as F
from toyfhe_tpu.core import ring as ringops
from toyfhe_tpu.ops import ntt_mxu as mxu
from toyfhe_tpu.parallel import ops as pops


@pytest.fixture(scope="module")
def setup():
    N, B = 1024, 2                       # N1=128 → n2=8 columns for 'cp'
    ring = F.make_rns_ring(N, (29, 29, 28, 28))   # MXU needs primes < 2^30
    params = F.CKKSParams(ring, 0, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    vals = np.linspace(0.05, 0.9, N // 2)
    scale = Fraction(2) ** 45
    cts = [F.encrypt(kp, F.make_plaintext(ring, vals * (i + 1), scale), k)
           for i, k in enumerate(jax.random.split(ks[2], B))]
    duals = jnp.stack(
        [jnp.stack([ringops.ensure_dual(ring, x).dual for x in c.cs], 0)
         for c in cts], 0)                                    # [B,2,L,N]
    masks = jnp.stack([ringops.ensure_dual(ring, kc.mask).dual
                       for kc in ek.key.key], 0)
    maskeds = jnp.stack([ringops.ensure_dual(ring, kc.masked).dual
                         for kc in ek.key.key], 0)
    return ring, duals, masks, maskeds


@pytest.mark.parametrize("n_rp,n_cp", [
    pytest.param(2, 4, marks=pytest.mark.slow),
    pytest.param(4, 2, marks=pytest.mark.slow),
    (2, 2),
])
def test_2axis_step_matches_single_chip(setup, n_rp, n_cp):
    ring, duals, masks, maskeds = setup
    single = pops.make_single_chip_step(ring.tables, masks, maskeds)
    expect = np.asarray(single(duals))

    mt = mxu.MxuNttTables(ring.tables)
    devs = np.asarray(jax.devices()[: n_rp * n_cp]).reshape(n_rp, n_cp)
    mesh = Mesh(devs, ("rp", "cp"))
    step, place, (in_src, out_nat) = pops.make_2axis_step(
        mesh, mt, masks, maskeds, n_cp=n_cp)
    out_layout = np.asarray(step(place(duals)))

    nat = np.zeros_like(out_layout)
    nat[..., out_nat] = out_layout
    np.testing.assert_array_equal(nat, expect)
