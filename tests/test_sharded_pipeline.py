"""SHARDED serving pipeline (SURVEY §7 stage 8): the compiled MNIST
pipeline — conv, fused squares, BSGS dense layers with hoisted
rotate_many / lazy-ModDown rotate_sum — running over a ('dp', 'rp')
mesh on the virtual 8-device CPU mesh (conftest).

All pipeline arithmetic is exact modular integer math, so the sharded
run must be BIT-IDENTICAL to the single-device compiled pipeline, and
its labels must agree with the plaintext model (the reference's headline
assertion, infer.jl:179-207).
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from toyfhe_tpu.models import mnist as M


def _mesh(dp, rp):
    devs = np.asarray(jax.devices()[: dp * rp]).reshape(dp, rp)
    return Mesh(devs, ("dp", "rp"))


def _run_both(cfg, steps=30, seed=2):
    kt, kf, ke = jax.random.split(jax.random.PRNGKey(seed), 3)
    data = M.synthetic_dataset(cfg, jax.random.PRNGKey(8), 256)
    params, _ = M.train(cfg, kt, steps=steps, data=data)
    imgs = np.asarray(M.synthetic_dataset(cfg, jax.random.PRNGKey(3),
                                          cfg.batch)[0])
    setup = M.fhe_setup(cfg, kf)
    gks = M.keygen_matmul_bsgs(setup, jax.random.PRNGKey(9))
    ref = M.encrypted_inference_fast(setup, params, imgs, ke, gks_bsgs=gks)

    setup2 = M.fhe_setup(cfg, kf)
    gks2 = M.keygen_matmul_bsgs(setup2, jax.random.PRNGKey(9))
    sh = M.encrypted_inference_fast(setup2, params, imgs, ke,
                                    gks_bsgs=gks2, mesh=_mesh(2, 4))
    plain = np.asarray(M.model_forward(cfg, params, imgs))
    return ref, sh, plain


def test_sharded_pipeline_bit_equal():
    """dp=2 × rp=4 sharded pipeline ≡ single-device, tiny geometry."""
    cfg = M.MNISTConfig(image=8, kernel=4, stride=4, channels=2, classes=4,
                        ring_logn=6)
    ref, sh, plain = _run_both(cfg)
    assert np.array_equal(sh, ref)          # bit-identical logits
    assert np.array_equal(np.argmax(sh.T, -1), np.argmax(plain, -1))


@pytest.mark.slow
def test_sharded_pipeline_49ct_grid():
    """The REFERENCE-SHAPED 49-ciphertext grid (kernel=7 → 7×7 cts,
    64-position dense layers — infer.jl:97-124's structure at a
    CPU-sized ring): sharded over the 8-device mesh, bit-equal to
    single-device, labels agree with the plaintext model."""
    cfg = M.MNISTConfig(image=28, kernel=7, stride=3, channels=2,
                        classes=4, ring_logn=9)
    assert cfg.kernel * cfg.kernel == 49 and cfg.positions == 64
    ref, sh, plain = _run_both(cfg, steps=80)
    assert np.array_equal(sh, ref)
    err = np.abs(sh.T - plain).max()
    assert err < 0.5, err
    assert np.array_equal(np.argmax(sh.T, -1), np.argmax(plain, -1))
