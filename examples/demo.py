"""End-to-end demo of toyfhe_tpu through the public API.

Covers the reference's headline flows (ToyFHE.jl README usage): BFV
scalar arithmetic with relinearization and noise tracking, and the CKKS
pipeline with rescaling, slot rotation and the SEAL-style special-prime
key switch.

Run on CPU:
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python -u examples/demo.py
Run on TPU: python -u examples/demo.py
"""

import sys
from fractions import Fraction

import jax
import numpy as np

sys.path.insert(0, ".")
import toyfhe_tpu as F


def demo_bfv():
    print("== BFV ==")
    params = F.bfv_params(7, eval_mult_count=3)
    print("auto-generated ring:", params.ring_cipher)
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    c = F.encrypt(kp, F.scalar_encode(params.plaintext_space(), 2), ks[2])
    print("decrypt:", F.decrypt(kp, c)[0])
    csq = F.keyswitch(ek, F.ct_mul(c, c))
    print("2^2 =", F.decrypt(kp, csq)[0],
          " budget:", round(F.invariant_noise_budget(kp, csq), 1), "bits")
    cm = F.keyswitch(ek, F.ct_mul(csq, c))
    print("2^3 mod 7 =", F.decrypt(kp, cm)[0],
          " budget:", round(F.invariant_noise_budget(kp, cm), 1), "bits")
    assert F.decrypt(kp, cm)[0] == 1


def demo_ckks():
    print("== CKKS ==")
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    vals = np.arange(1, 17, dtype=np.float64)
    ring = F.make_rns_ring(32, (30, 29, 29, 30))      # last limb = special prime
    mr = F.ModulusRaised(F.CKKSParams(ring, 0, 3.2))
    kp = F.keygen(mr, ks[0])
    pt = F.make_plaintext(mr.ring_cipher, vals, Fraction(2) ** 40)
    c = F.encrypt(kp, pt, ks[1])
    ek = F.keygen_eval_mult(ks[2], kp.priv)
    gk = F.keygen_galois(ks[3], kp.priv, steps=1)

    sq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
    err = np.abs(F.decrypt(kp, sq).real - vals ** 2).max()
    print("squares err:", err)
    rot = F.rotate(gk, c)
    err_r = np.abs(F.decrypt(kp, rot) - np.roll(vals.astype(complex), 1)).max()
    print("rotation err:", err_r)
    assert err < 1e-2 and err_r < 1e-4


def demo_hybrid():
    """Production dnum-grouped hybrid key-switch (core/hybrid.py):
    digits are limb groups, keys are alpha x smaller, and a key-switch
    costs dnum digit NTT batches instead of L (1.5-1.8x measured on
    TPU — docs/performance.md)."""
    print("== CKKS, hybrid (dnum) gadget ==")
    ks = jax.random.split(jax.random.PRNGKey(9), 5)
    vals = np.linspace(0.1, 1.5, 16)
    ring = F.make_rns_ring(32, (28,) * 6 + (29, 29))  # 6 ct limbs + P
    params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), dnum=3,
                            num_special=2)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                       Fraction(2) ** 26), ks[2])
    sq = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
    err = np.abs(F.decrypt(kp, sq).real - vals ** 2).max()
    print(f"dnum=3 digits: {len(ek.key.key)} (vs L=6)  squares err: {err:.1e}")
    assert err < 1e-3


def demo_leveled_bgv():
    """Leveled BGV with raising-gadget key switching (beyond the
    reference): p-adapted rounding keeps the error = 0 mod p, and the
    BGVTag tracks the q^-1 mod p message factor across modswitches."""
    print("== leveled BGV ==")
    ks = jax.random.split(jax.random.PRNGKey(13), 4)
    ring = F.make_rns_ring(64, (28,) * 4 + (30, 30))
    params = F.ModulusRaised(F.BGVParams(ring, 257, 3.2))
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    c = F.encrypt(kp, F.scalar_encode(params.plaintext_space(), 6), ks[2])
    m = 6
    for lvl in range(2):
        c = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
        m = m * m % 257
    print(f"6^4 mod 257 = {F.decrypt(kp, c)[0]} at tower depth "
          f"{c.ring.nlimbs} (exact: {m})")
    assert F.decrypt(kp, c)[0] == m


def demo_bootstrap():
    """CKKS bootstrap: refresh an exhausted ciphertext without the
    secret key (beyond the reference — ToyFHE is leveled only)."""
    print("== CKKS bootstrap ==")
    from toyfhe_tpu.core import bootstrap as B

    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    ring = F.make_rns_ring(32, (30,) * 17)
    params = F.CKKSParams(ring, 4, 3.2, secret="sparse", hamming_weight=4)
    kp = F.keygen(params, ks[0])
    ctx = B.setup_bootstrap(ks[1], kp.priv, K=5.0, deg=46)
    vals = np.linspace(-0.7, 0.7, 16) + 0.2j
    c = F.encrypt(kp, F.make_plaintext(ring, vals, Fraction(2) ** 23), ks[2])
    while c.ring.nlimbs > 1:                      # exhaust the tower
        c = F.ct_modswitch_drop(c)
    out = B.bootstrap(ctx, c)
    err = np.abs(F.decrypt(kp, out) - vals).max()
    print(f"refreshed {c.ring.nlimbs} limb -> {out.ring.nlimbs} limbs, "
          f"err: {err:.2e}")
    assert out.ring.nlimbs >= 5 and err < 5e-2


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    demo_bfv()
    demo_ckks()
    demo_hybrid()
    demo_leveled_bgv()
    demo_bootstrap()
    print("demo OK")
