"""Key/ciphertext persistence round-trips (new capability vs reference)."""

from fractions import Fraction

import jax
import numpy as np

import toyfhe_tpu as F
from toyfhe_tpu.utils import serialization as ser


def test_roundtrip(tmp_path):
    ring = F.make_rns_ring(32, (30, 29, 29))   # q must exceed scale² = 2^80
    params = F.CKKSParams(ring, 4, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    kp = F.keygen(params, ks[0])
    vals = np.arange(1, 17, dtype=np.float64)
    c = F.encrypt(kp, F.make_plaintext(ring, vals, Fraction(2) ** 40), ks[1])

    ser.save_keypair(str(tmp_path / "kp.npz"), kp)
    ser.save_ciphertext(str(tmp_path / "ct.npz"), c)

    kp2 = ser.load_keypair(str(tmp_path / "kp.npz"), params)
    c2 = ser.load_ciphertext(str(tmp_path / "ct.npz"), params)
    np.testing.assert_allclose(F.decrypt(kp2, c2).real, vals, atol=1e-6)

    ek = F.keygen_eval_mult(ks[2], kp.priv)
    ser.save_keyswitch_key(str(tmp_path / "ek.npz"), ek.key)
    ek2 = F.EvalMultKey(ser.load_keyswitch_key(str(tmp_path / "ek.npz"), params))
    y = F.keyswitch(ek2, F.ct_mul(c, c))
    np.testing.assert_allclose(F.decrypt(kp, y).real, vals ** 2, atol=1e-2)


def test_galois_and_evalmult_key_roundtrip(tmp_path):
    ring = F.make_rns_ring(32, (30, 29, 29))
    params = F.CKKSParams(ring, 4, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    kp = F.keygen(params, ks[0])
    gk = F.keygen_galois(ks[1], kp.priv, steps=1)
    ser.save_galois_key(str(tmp_path / "gk.npz"), gk)
    gk2 = ser.load_galois_key(str(tmp_path / "gk.npz"), params)
    assert gk2.galois_element == gk.galois_element
    vals = np.arange(1, 17, dtype=np.float64)
    c = F.encrypt(kp, F.make_plaintext(ring, vals, Fraction(2) ** 40), ks[2])
    got = F.decrypt(kp, F.rotate(gk2, c))
    np.testing.assert_allclose(got, np.roll(vals.astype(complex), 1),
                               atol=1e-4)

    ek = F.keygen_eval_mult(ks[1], kp.priv)
    ser.save_eval_mult_key(str(tmp_path / "ek.npz"), ek)
    ek2 = ser.load_eval_mult_key(str(tmp_path / "ek.npz"), params)
    y = F.keyswitch(ek2, F.ct_mul(c, c))
    np.testing.assert_allclose(F.decrypt(kp, y).real, vals ** 2, atol=1e-2)


def test_hybrid_key_roundtrip(tmp_path):
    """dnum-grouped hybrid keys round-trip: components live at the full
    Q·P key tower; params (dnum/num_special) are reconstructed by the
    caller, as with every modifier."""
    ring = F.make_rns_ring(32, (28,) * 4 + (30, 30))
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), 2, 2)
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    assert len(ek.key.key) == 2                      # dnum digits, not L
    ser.save_eval_mult_key(str(tmp_path / "hek.npz"), ek)
    ek2 = ser.load_eval_mult_key(str(tmp_path / "hek.npz"), params)
    vals = np.linspace(0.2, 1.5, 16)
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 26), ks[2])
    y = F.ct_rescale(F.keyswitch(ek2, F.ct_mul(c, c)))
    np.testing.assert_allclose(F.decrypt(kp, y).real, vals ** 2, atol=1e-3)
