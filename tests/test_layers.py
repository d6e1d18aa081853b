"""Jitted encrypted layers vs the eager engine — bit-exact equivalence."""

from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import ring as ringops
from toyfhe_tpu.parallel import layers as L


@pytest.fixture(scope="module")
def setup():
    N = 32
    ring = F.make_rns_ring(N, (30, 29, 28, 29))     # 3 data limbs + special
    params = F.ModulusRaised(F.CKKSParams(ring, 0, 3.2))
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    gk = F.keygen_galois(ks[2], kp.priv, steps=4)
    scale = Fraction(2) ** 28
    vals = np.linspace(0.5, 4.0, N // 2)
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals, scale), ks[3])
    return params, kp, ek, gk, c, vals, scale


def _primal(ring, c):
    return [np.asarray(ringops.ensure_primal(ring, x).primal) for x in c.cs]


def test_rotate_matmul_layer_bitexact(setup):
    params, kp, ek, gk, c, vals, scale = setup
    ct_ring = params.ring_cipher
    d = 4
    rng = np.random.default_rng(1)
    W = rng.normal(size=(d, d))

    # eager reference (encrypted_matmul, infer.jl:141-150 with tile)
    nrep = ct_ring.n // 2 // d
    res = F.mul_plain_vector(c, np.tile(np.diag(W), nrep))
    rot = c
    diags = [np.tile(np.diag(W), nrep)]
    for k in range(1, d):
        rot = F.rotate(gk, rot)
        dk = np.tile(np.diag(np.roll(W, k, axis=1)), nrep)
        diags.append(dk)
        res = F.ct_add(res, F.mul_plain_vector(rot, dk))

    # jitted layer with identical pre-encoded diagonals
    layer = L.RotateMatmulLayer(params, gk, gk.galois_element, d)
    diag_dual = jnp.stack([
        ringops.ensure_dual(ct_ring, F.ckks_encode(ct_ring, v.astype(complex),
                                                   scale)).dual
        for v in diags], 0)
    c1p, c2p = _primal(ct_ring, c)
    r1, r2 = layer(jnp.asarray(c1p), jnp.asarray(c2p), diag_dual)

    ref1 = np.asarray(ringops.ensure_dual(ct_ring, res.cs[0]).dual)
    ref2 = np.asarray(ringops.ensure_dual(ct_ring, res.cs[1]).dual)
    np.testing.assert_array_equal(np.asarray(r1), ref1)
    np.testing.assert_array_equal(np.asarray(r2), ref2)

    # and it decrypts to the right matmul
    out = F.CipherText(params, (F.RingElt(dual=r1), F.RingElt(dual=r2)),
                       ct_ring, enc=F.CKKSTag(scale * scale))
    got = F.decrypt(kp, out).real
    expect = np.zeros(ct_ring.n // 2)
    for k in range(d):
        expect += diags[k] * np.roll(vals, 4 * k)
    np.testing.assert_allclose(got, expect, atol=1e-3)


def test_square_relin_layer_bitexact(setup):
    params, kp, ek, gk, c, vals, scale = setup
    ct_ring = params.ring_cipher
    seq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
    layer = L.SquareRelinLayer(params, ek)
    c1p, c2p = _primal(ct_ring, c)
    o1, o2 = layer(jnp.asarray(c1p), jnp.asarray(c2p))
    ref1 = np.asarray(ringops.ensure_primal(seq.ring, seq.cs[0]).primal)
    ref2 = np.asarray(ringops.ensure_primal(seq.ring, seq.cs[1]).primal)
    np.testing.assert_array_equal(np.asarray(o1), ref1)
    np.testing.assert_array_equal(np.asarray(o2), ref2)


@pytest.fixture(scope="module")
def hybrid_setup():
    N = 32
    # 6 ct limbs + 2 raising primes; dnum=3 groups of alpha=2
    ring = F.make_rns_ring(N, (28,) * 6 + (30, 30))
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), dnum=3,
                            num_special=2)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    gk = F.keygen_galois(ks[2], kp.priv, steps=4)
    scale = Fraction(2) ** 26
    vals = np.linspace(0.5, 4.0, N // 2)
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals, scale), ks[3])
    return params, kp, ek, gk, c, vals, scale


def test_hybrid_rotate_matmul_layer_bitexact(hybrid_setup):
    """Compiled RotateMatmulLayer on the dnum-grouped hybrid gadget is
    bit-identical to the eager engine keyswitch (core/hybrid.py)."""
    params, kp, ek, gk, c, vals, scale = hybrid_setup
    ct_ring = params.ring_cipher
    d = 4
    rng = np.random.default_rng(1)
    W = rng.normal(size=(d, d))
    nrep = ct_ring.n // 2 // d
    res = F.mul_plain_vector(c, np.tile(np.diag(W), nrep))
    rot = c
    diags = [np.tile(np.diag(W), nrep)]
    for k in range(1, d):
        rot = F.rotate(gk, rot)
        dk = np.tile(np.diag(np.roll(W, k, axis=1)), nrep)
        diags.append(dk)
        res = F.ct_add(res, F.mul_plain_vector(rot, dk))

    layer = L.RotateMatmulLayer(params, gk, gk.galois_element, d)
    assert isinstance(layer.ka, L.HybridKeyArrays)
    diag_dual = jnp.stack([
        ringops.ensure_dual(ct_ring, F.ckks_encode(ct_ring, v.astype(complex),
                                                   scale)).dual
        for v in diags], 0)
    c1p, c2p = _primal(ct_ring, c)
    r1, r2 = layer(jnp.asarray(c1p), jnp.asarray(c2p), diag_dual)
    ref1 = np.asarray(ringops.ensure_dual(ct_ring, res.cs[0]).dual)
    ref2 = np.asarray(ringops.ensure_dual(ct_ring, res.cs[1]).dual)
    np.testing.assert_array_equal(np.asarray(r1), ref1)
    np.testing.assert_array_equal(np.asarray(r2), ref2)


def test_hybrid_square_relin_layer_bitexact(hybrid_setup):
    params, kp, ek, gk, c, vals, scale = hybrid_setup
    ct_ring = params.ring_cipher
    seq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
    layer = L.SquareRelinLayer(params, ek)
    assert isinstance(layer.ka, L.HybridKeyArrays)
    c1p, c2p = _primal(ct_ring, c)
    o1, o2 = layer(jnp.asarray(c1p), jnp.asarray(c2p))
    ref1 = np.asarray(ringops.ensure_primal(seq.ring, seq.cs[0]).primal)
    ref2 = np.asarray(ringops.ensure_primal(seq.ring, seq.cs[1]).primal)
    np.testing.assert_array_equal(np.asarray(o1), ref1)
    np.testing.assert_array_equal(np.asarray(o2), ref2)

    got = F.decrypt(kp, F.CipherText(
        params, (F.RingElt(primal=o1), F.RingElt(primal=o2)),
        layer.sub_ring, enc=seq.enc))
    np.testing.assert_allclose(got.real, vals ** 2, atol=1e-3)


def test_hybrid_layer_at_dropped_tower(hybrid_setup):
    """Layer built at a dropped tower level (3 limbs — below the first
    group boundary) still matches the eager engine bit-for-bit."""
    params, kp, ek, gk, c, vals, scale = hybrid_setup
    while c.ring.nlimbs > 3:
        c = F.ct_modswitch_drop(c)
    ct_ring = c.ring
    seq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
    layer = L.SquareRelinLayer(params, ek, ct_ring)
    c1p, c2p = _primal(ct_ring, c)
    o1, o2 = layer(jnp.asarray(c1p), jnp.asarray(c2p))
    ref1 = np.asarray(ringops.ensure_primal(seq.ring, seq.cs[0]).primal)
    ref2 = np.asarray(ringops.ensure_primal(seq.ring, seq.cs[1]).primal)
    np.testing.assert_array_equal(np.asarray(o1), ref1)
    np.testing.assert_array_equal(np.asarray(o2), ref2)


@pytest.mark.slow
def test_fast_mnist_pipeline():
    """Compiled-layer MNIST pipeline end-to-end (small config)."""
    import jax
    import numpy as np
    from toyfhe_tpu.models import mnist as M

    cfg = M.MNISTConfig(image=14, kernel=5, stride=3, channels=2, classes=4,
                        ring_logn=9,
                        limb_bits=(30, 30, 28, 28, 28, 28, 28, 30),
                        scale_log2=28, gadget="modraise")
    kt, kf, ke = jax.random.split(jax.random.PRNGKey(2), 3)
    data = M.synthetic_dataset(cfg, jax.random.PRNGKey(8), 256)
    params, acc = M.train(cfg, kt, steps=80, data=data)
    assert acc > 0.9
    imgs, _ = M.synthetic_dataset(cfg, jax.random.PRNGKey(3), cfg.batch)
    imgs = np.asarray(imgs)
    plain = np.asarray(M.model_forward(cfg, params, imgs))
    setup = M.fhe_setup(cfg, kf)
    enc = M.encrypted_inference_fast(setup, params, imgs, ke)
    assert np.abs(enc.T - plain).max() < 0.5
    assert np.array_equal(np.argmax(enc.T, -1), np.argmax(plain, -1))

    # compiled BSGS dense layers (hoisting + lazy ModDown in one jit per
    # layer): same labels, logits within the keyswitch-noise class
    gks = M.keygen_matmul_bsgs(setup, jax.random.PRNGKey(9))
    enc_bsgs = M.encrypted_inference_fast(setup, params, imgs, ke,
                                          gks_bsgs=gks)
    assert np.abs(enc_bsgs - enc).max() < 1e-2
    assert np.array_equal(np.argmax(enc_bsgs.T, -1), np.argmax(plain, -1))


@pytest.mark.slow
def test_hybrid_window_layer_bitexact():
    """Windowed (hybrid) gadget in the compiled layers matches the eager
    engine bit-exactly, including after a modswitch drop (digit count
    pinned to the key's decomposition ring)."""
    N = 32
    ring = F.make_rns_ring(N, (30, 29, 28, 29))
    params = F.ModulusRaised(F.CKKSParams(ring, 8, 3.2))   # window = 8
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    kp = F.keygen(params, ks[0])
    gk = F.keygen_galois(ks[1], kp.priv, steps=2)
    scale = Fraction(2) ** 28
    vals = np.linspace(0.5, 4.0, N // 2)
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals, scale), ks[2])

    for lvl_c in (c, F.ct_rescale(c)):      # full level and one drop
        ct_ring = lvl_c.ring
        seq = F.rotate(gk, lvl_c)
        layer = L.RotateMatmulLayer(params, gk, gk.galois_element, 1, ct_ring)
        ones = np.ones(ct_ring.n // 2)
        sc = lvl_c.enc.scale
        diag = jnp.stack([ringops.ensure_dual(
            ct_ring, F.ckks_encode(ct_ring, ones.astype(complex), sc)).dual], 0)
        # d=1 layer = identity diag-mul only; compare the keyswitch core
        o1, o2 = L._modraise_keyswitch(
            layer.ka,
            *[np.asarray(ringops.ensure_primal(ct_ring,
                F.apply_galois_ct(lvl_c, gk.galois_element).cs[i]).primal)
              for i in range(2)])
        ref1 = np.asarray(ringops.ensure_primal(seq.ring, seq.cs[0]).primal)
        ref2 = np.asarray(ringops.ensure_primal(seq.ring, seq.cs[1]).primal)
        np.testing.assert_array_equal(np.asarray(o1), ref1)
        np.testing.assert_array_equal(np.asarray(o2), ref2)


@pytest.mark.slow
def test_fused_pallas_keyswitch():
    """Fused Pallas keyswitch kernel (digits+NTTs+contract+INTT in VMEM)
    bit-exact vs the compiled-layer path (interpret mode)."""
    from toyfhe_tpu.ops import modmath, ntt as nttmod
    from toyfhe_tpu.ops import pallas_keyswitch as PKS
    from toyfhe_tpu.parallel.ops import _mp_full

    N = 64
    ring = F.make_rns_ring(N, (29, 28, 28, 29))
    params = F.ModulusRaised(F.CKKSParams(ring, 8, 3.2))
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    kp = F.keygen(params, ks[0])
    gk = F.keygen_galois(ks[1], kp.priv, steps=1)
    vals = np.linspace(0.5, 2.0, N // 2)
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 27), ks[2])

    ka = L.build_modraise_key_arrays(params, gk.key)
    ct_ring = ka.ct_ring
    g = F.apply_galois_ct(c, gk.galois_element)
    c1p = np.asarray(ringops.ensure_primal(ct_ring, g.cs[0]).primal)
    c2p = np.asarray(ringops.ensure_primal(ct_ring, g.cs[1]).primal)
    r1, r2 = L._modraise_keyswitch(ka, jnp.asarray(c1p), jnp.asarray(c2p))

    fk = PKS.FusedKeyswitch(ka.exp_ring.tables, np.asarray(ka.masks),
                            np.asarray(ka.maskeds), ka.window,
                            ka.k_per_limb, ct_ring.nlimbs)
    mp_ct = _mp_full(ka.tabs_ct)
    c1d = np.asarray(nttmod.ntt(ct_ring.tables, modmath.mul_mod(
        jnp.asarray(c1p), ka.ps_res, mp_ct)))
    c1e = np.concatenate([c1d, np.zeros((1, N), np.uint32)], 0)[:, fk.brev]
    o1, o2 = fk(jnp.asarray(c2p), jnp.asarray(c1e), interpret=True)

    def rescale(x):
        last_mod = modmath.umod(jnp.asarray(np.asarray(x)[-1:]), mp_ct.p)
        diff = modmath.sub_mod(jnp.asarray(np.asarray(x)[:-1]), last_mod, mp_ct)
        return np.asarray(modmath.mont_mul(diff, ka.inv_ps_mont, mp_ct))

    np.testing.assert_array_equal(rescale(o1), np.asarray(r1))
    np.testing.assert_array_equal(rescale(o2), np.asarray(r2))


@pytest.mark.slow
def test_dual_flow_pipeline_bitexact():
    """The dual-domain serving pipeline (round-3 VERDICT item 3: conv +
    bias rescale in the dual domain, fused 61-transform square layers,
    dense layers on dual-resident ciphertexts) produces BIT-identical
    logits to the primal-boundary flow — the dual rescale and the fused
    contraction are algebraic refactorings of the same exact modular
    arithmetic."""
    import jax
    import numpy as np
    from toyfhe_tpu.models import mnist as M

    cfg = M.MNISTConfig(image=14, kernel=5, stride=3, channels=2, classes=4,
                        ring_logn=9,
                        limb_bits=(30, 30, 28, 28, 28, 28, 28) + (30,) * 3,
                        scale_log2=28, gadget="hybrid", dnum=3,
                        num_special=3)
    kt, kf, ke = jax.random.split(jax.random.PRNGKey(2), 3)
    data = M.synthetic_dataset(cfg, jax.random.PRNGKey(8), 256)
    params, _ = M.train(cfg, kt, steps=30, data=data)
    imgs = np.asarray(M.synthetic_dataset(cfg, jax.random.PRNGKey(3),
                                          cfg.batch)[0])
    setup = M.fhe_setup(cfg, kf)
    gks = M.keygen_matmul_bsgs(setup, jax.random.PRNGKey(9))
    enc_primal = M.encrypted_inference_fast(setup, params, imgs, ke,
                                            gks_bsgs=gks, dual_flow=False)
    enc_dual = M.encrypted_inference_fast(setup, params, imgs, ke,
                                          gks_bsgs=gks, dual_flow=True)
    assert np.array_equal(enc_dual, enc_primal)


@pytest.mark.slow
def test_fast_mnist_pipeline_hybrid():
    """Compiled-layer MNIST pipeline on the dnum-grouped hybrid gadget
    (small config): same label agreement as the plaintext model."""
    import jax
    import numpy as np
    from toyfhe_tpu.models import mnist as M

    cfg = M.MNISTConfig(image=14, kernel=5, stride=3, channels=2, classes=4,
                        ring_logn=9,
                        limb_bits=(30, 30, 28, 28, 28, 28, 28) + (30,) * 3,
                        scale_log2=28, gadget="hybrid", dnum=3,
                        num_special=3)
    kt, kf, ke = jax.random.split(jax.random.PRNGKey(2), 3)
    data = M.synthetic_dataset(cfg, jax.random.PRNGKey(8), 256)
    params, acc = M.train(cfg, kt, steps=80, data=data)
    assert acc > 0.9
    imgs, _ = M.synthetic_dataset(cfg, jax.random.PRNGKey(3), cfg.batch)
    imgs = np.asarray(imgs)
    plain = np.asarray(M.model_forward(cfg, params, imgs))
    setup = M.fhe_setup(cfg, kf)
    enc = M.encrypted_inference_fast(setup, params, imgs, ke)
    assert np.abs(enc.T - plain).max() < 0.5
    assert np.array_equal(np.argmax(enc.T, -1), np.argmax(plain, -1))
