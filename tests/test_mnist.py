"""Encrypted-CNN end-to-end test (scaled-down encrypted_mnist workload).

Mirrors the reference's two key assertions (infer.jl:92, :179-207):
  1. the plaintext model restructured for homomorphic evaluation equals
     the direct forward pass;
  2. encrypted inference produces the same labels as the plaintext model.

Scaled geometry for CPU: 14×14 images, 5×5 kernel stride 3 → 4×4 = 16
positions, N=2^9 ring → 16-image batch, 2 channels.
"""

import jax
import numpy as np
import pytest

from toyfhe_tpu.models import mnist as M


SMALL = M.MNISTConfig(image=14, kernel=5, stride=3, channels=2, classes=4,
                      ring_logn=9,
                      limb_bits=(30, 30, 28, 28, 28, 28, 28, 30),
                      scale_log2=28, gadget="modraise")

# the production default gadget (hybrid dnum=2, num_special=4) at the
# same small geometry — the tower carries 7 data limbs + 4 raising
# primes to MATCH the default partition (round-4 regression: a 10-limb
# tower under num_special=4 silently lost a data limb, L 7→6, and the
# pipeline decoded garbage; fhe_setup's audit_pipeline_depth now
# rejects that class of config at setup time)
SMALL_HYB = M.MNISTConfig(image=14, kernel=5, stride=3, channels=2,
                          classes=4, ring_logn=9,
                          limb_bits=(28,) * 7 + (29,) * 4,
                          scale_log2=28)

# regression at the round-3 partition: same 10-limb tower as before,
# with the gadget pinned EXPLICITLY to the 7+3 split it was built for
SMALL_HYB_D3 = M.MNISTConfig(image=14, kernel=5, stride=3, channels=2,
                             classes=4, ring_logn=9,
                             limb_bits=(28,) * 7 + (29,) * 3,
                             scale_log2=28, dnum=3, num_special=3)


def test_geometry():
    assert SMALL.positions == 16
    assert SMALL.batch == 16
    assert SMALL.features == 32


def test_plain_model_trains():
    # synthetic stand-in: a fast "does the x²-CNN train at all" smoke
    data = M.synthetic_dataset(SMALL, jax.random.PRNGKey(2), 256)
    params, acc = M.train(SMALL, jax.random.PRNGKey(0), steps=80, data=data)
    assert acc > 0.9, acc


def test_trains_on_real_digits():
    """Default data path: REAL handwritten digits (local MNIST if
    present, else the bundled sklearn scans), held-out accuracy."""
    data = M.load_real_digits(SMALL)
    assert data is not None and len(data[1]) > 500   # 4 of 10 classes kept
    _, acc = M.train(SMALL, jax.random.PRNGKey(0), steps=400, lr=2e-3)
    assert acc > 0.9, acc


def test_preprocess_matches_patches():
    cfg = SMALL
    key = jax.random.PRNGKey(1)
    imgs, _ = M.synthetic_dataset(cfg, key, cfg.batch)
    I = M.public_preprocess(cfg, np.asarray(imgs))
    pt = np.asarray(M._patches(cfg, imgs))        # [B, P, k*k]
    for i in range(cfg.kernel):
        for j in range(cfg.kernel):
            expect = pt[:, :, i * cfg.kernel + j].T.reshape(-1)
            np.testing.assert_allclose(I[i, j], expect, atol=1e-6)


def test_bsgs_matmul_matches_iterated():
    """encrypted_matmul_bsgs (hoisted babies + lazy-ModDown giants,
    2√d keyswitches) agrees with the reference d-rotation schedule
    (infer.jl:141-150) and with the plaintext matmul."""
    from fractions import Fraction

    cfg = SMALL
    kf, ke = jax.random.split(jax.random.PRNGKey(4), 2)
    setup = M.fhe_setup(cfg, kf)
    d = cfg.positions
    rng = np.random.default_rng(5)
    W = rng.uniform(-1, 1, (d, d))
    xfeat = rng.uniform(-1, 1, d)
    slots = M._rep_inner(xfeat, cfg.batch).astype(complex)
    import toyfhe_tpu as F
    c = F.encrypt(setup.kp,
                  F.make_plaintext(setup.params.ring_cipher, slots,
                                   setup.scale), ke)
    gks = M.keygen_matmul_bsgs(setup, jax.random.PRNGKey(6))
    out_bsgs = F.decrypt(setup.kp, M.encrypted_matmul_bsgs(
        setup, gks, W, c)).real
    out_iter = F.decrypt(setup.kp, M.encrypted_matmul(setup, W, c)).real
    expect = M._rep_inner(W @ xfeat, cfg.batch)
    np.testing.assert_allclose(out_bsgs, expect, atol=1e-3)
    np.testing.assert_allclose(out_bsgs, out_iter, atol=1e-3)


@pytest.mark.slow
def test_encrypted_inference_label_agreement():
    cfg = SMALL
    kt, kf, ke = jax.random.split(jax.random.PRNGKey(2), 3)
    params, acc = M.train(cfg, kt, steps=80)
    imgs, labels = M.synthetic_dataset(cfg, jax.random.PRNGKey(3), cfg.batch)
    imgs = np.asarray(imgs)

    plain_logits = np.asarray(M.model_forward(cfg, params, imgs))  # [B, classes]
    setup = M.fhe_setup(cfg, kf)
    enc_logits = M.encrypted_inference(setup, params, imgs, ke)    # [classes, B]

    err = np.abs(enc_logits.T - plain_logits).max()
    assert err < 0.5, err           # absolute precision sanity
    # the reference's headline assertion: encrypted labels == plain labels
    # (infer.jl:179-207)
    assert np.array_equal(np.argmax(enc_logits.T, -1), np.argmax(plain_logits, -1))

    # BSGS dense layers (hoisted babies, layer-wide lazy ModDown) must
    # reproduce the same logits at the same noise class
    gks = M.keygen_matmul_bsgs(setup, jax.random.PRNGKey(9))
    bsgs_logits = M.encrypted_inference(setup, params, imgs, ke,
                                        gks_bsgs=gks)
    np.testing.assert_allclose(bsgs_logits, enc_logits, atol=1e-2)
    assert np.array_equal(np.argmax(bsgs_logits.T, -1),
                          np.argmax(plain_logits, -1))


def test_too_short_tower_raises():
    """A tower whose partition leaves too few data limbs for the
    pipeline must FAIL at fhe_setup, not decode garbage (the round-4
    silent-corruption mode: passes P≥α·Q and security guards, errs 67).
    """
    import toyfhe_tpu as F
    bad = M.MNISTConfig(image=14, kernel=5, stride=3, channels=2,
                        classes=4, ring_logn=9,
                        limb_bits=(28,) * 6 + (29,) * 4,   # L=6 < needed
                        scale_log2=28)
    with pytest.raises(F.UsageError, match="depth|data limbs"):
        M.fhe_setup(bad, jax.random.PRNGKey(0))
    # the exact round-4 failure shape: 10-limb tower, default k=4 → L=6
    bad2 = M.MNISTConfig(image=14, kernel=5, stride=3, channels=2,
                         classes=4, ring_logn=9,
                         limb_bits=(28,) * 7 + (29,) * 3,
                         scale_log2=28)      # inherits dnum=2, k=4
    with pytest.raises(F.UsageError, match="depth|data limbs"):
        M.fhe_setup(bad2, jax.random.PRNGKey(0))
    # opt-out still available for non-pipeline single-op use
    M.fhe_setup(bad2, jax.random.PRNGKey(0), audit_depth=False)


@pytest.mark.slow
@pytest.mark.parametrize("cfg", [SMALL_HYB, SMALL_HYB_D3],
                         ids=["dnum2_k4_default", "dnum3_k3_regression"])
def test_encrypted_inference_hybrid_gadget(cfg):
    """End-to-end inference on the PRODUCTION (hybrid dnum) gadget —
    the default serving configuration: label agreement with the
    plaintext model at the scaled-down geometry."""
    assert M.fhe_setup(cfg, jax.random.PRNGKey(0)).params.dnum == cfg.dnum
    kt, kf, ke = jax.random.split(jax.random.PRNGKey(2), 3)
    params, _ = M.train(cfg, kt, steps=80)
    imgs, _ = M.synthetic_dataset(cfg, jax.random.PRNGKey(3), cfg.batch)
    imgs = np.asarray(imgs)
    plain_logits = np.asarray(M.model_forward(cfg, params, imgs))
    setup = M.fhe_setup(cfg, kf)
    enc_logits = M.encrypted_inference(setup, params, imgs, ke)
    err = np.abs(enc_logits.T - plain_logits).max()
    assert err < 0.5, err
    assert np.array_equal(np.argmax(enc_logits.T, -1),
                          np.argmax(plain_logits, -1))


@pytest.mark.slow
def test_bootstrapped_inference_end_to_end():
    """Depth-unlimited pipeline (VERDICT round-1 item 3): conv → square
    → dense1 → square → BOOTSTRAP → dense2. The ciphertext is exhausted
    to one limb before the final layer and refreshed without the secret
    key; dense2 runs at the regained depth. Labels must agree with the
    plaintext model wherever the plaintext top-2 margin exceeds twice
    the measured refresh error."""
    cfg = M.MNISTConfig(image=8, kernel=4, stride=4, channels=2, classes=4,
                        ring_logn=6)
    kt, kf, ke = jax.random.split(jax.random.PRNGKey(2), 3)
    params, _ = M.train(cfg, kt, steps=200)
    setup, ctx = M.fhe_setup_bootstrapped(cfg, kf, depth=16, K=5.0, deg=46)
    imgs, _ = M.load_real_digits(cfg)
    imgs = np.asarray(imgs)[:cfg.batch]
    plain = np.asarray(M.model_forward(cfg, params, imgs))

    logits, depth_out = M.encrypted_inference_bootstrapped(
        setup, ctx, params, imgs, ke, prescale=32.0)
    assert depth_out >= 5                     # usable depth regained
    err = np.abs(logits.T - plain).max()
    assert err < 0.1, err
    srt = np.sort(plain, axis=-1)
    margin = srt[:, -1] - srt[:, -2]
    decided = margin > 2 * err
    assert decided.sum() >= cfg.batch // 2    # the model decides most
    assert np.array_equal(np.argmax(logits.T, -1)[decided],
                          np.argmax(plain, -1)[decided])


@pytest.mark.slow
def test_bootstrapped_inference_composite_scale():
    """The COMPOSITE-scale bootstrapped pipeline (the production config
    for N ≥ 2^11, docs/performance.md): hybrid dnum gadget, 2×29-bit
    base, 26-bit level limbs, factored transforms + double-angle
    EvalMod. ~1000× tighter than the single-prime path: every logit
    within 1e-3 of the plaintext model and ALL labels agree."""
    cfg = M.MNISTConfig(image=8, kernel=4, stride=4, channels=2, classes=4,
                        ring_logn=6)
    kt, kf, ke = jax.random.split(jax.random.PRNGKey(2), 3)
    params, _ = M.train(cfg, kt, steps=200)
    setup, ctx = M.fhe_setup_bootstrapped(
        cfg, kf, depth=46, K=5.0, deg=24, scale_limbs=2, radix=16,
        arcsin=True, double_angle=2, hamming_weight=4)
    imgs, _ = M.load_real_digits(cfg)
    imgs = np.asarray(imgs)[:cfg.batch]
    plain = np.asarray(M.model_forward(cfg, params, imgs))
    logits, depth_out = M.encrypted_inference_bootstrapped(
        setup, ctx, params, imgs, ke, prescale=32.0)
    assert depth_out >= 15
    err = np.abs(logits.T - plain).max()
    assert err < 1e-3, err
    assert np.array_equal(np.argmax(logits.T, -1), np.argmax(plain, -1))


@pytest.mark.slow
def test_bootstrapped_pipeline_compiled():
    """The COMPILED bootstrapped pipeline (build_bootstrapped_pipeline:
    per-stage jits at each tower level — the deep-tower counterparts of
    the L=7 serving layers) reproduces the composite-scale eager
    pipeline's guarantees: every logit within 1e-3 of the plaintext
    model, all labels agree, ≥15 limbs regained — and repeat calls are
    bit-stable at the warm (serving) rate."""
    cfg = M.MNISTConfig(image=8, kernel=4, stride=4, channels=2, classes=4,
                        ring_logn=6)
    kt, kf, ke = jax.random.split(jax.random.PRNGKey(2), 3)
    params, _ = M.train(cfg, kt, steps=200)
    setup, ctx = M.fhe_setup_bootstrapped(
        cfg, kf, depth=46, K=5.0, deg=24, scale_limbs=2, radix=16,
        arcsin=True, double_angle=2, hamming_weight=4)
    imgs, _ = M.load_real_digits(cfg)
    imgs = np.asarray(imgs)[:cfg.batch]
    plain = np.asarray(M.model_forward(cfg, params, imgs))
    run = M.build_bootstrapped_pipeline(setup, ctx, params, prescale=32.0)
    logits, depth_out = run(imgs, ke)
    assert depth_out >= 15
    err = np.abs(logits.T - plain).max()
    assert err < 1e-3, err
    assert np.array_equal(np.argmax(logits.T, -1), np.argmax(plain, -1))
    logits2, _ = run(imgs, ke)
    np.testing.assert_array_equal(logits2, logits)
