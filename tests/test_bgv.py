"""BGV scenario test — test/bgv_triv.jl: PALISADE m=4096 default ring,
p=256, scalar encrypt/decrypt + square."""

import jax

import toyfhe_tpu as F


def test_bgv_triv():
    params = F.BGVParams(F.cryptparams.palisade_ring(4096), 256,
                         8 / (2 * 3.141592653589793) ** 0.5)
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    kp = F.keygen(params, ks[0])
    plain = F.scalar_encode(params.plaintext_space(), 6)
    c = F.encrypt(kp, plain, ks[1])
    assert F.decrypt(kp, c)[0] == 6
    y = F.ct_mul(c, c)
    assert F.decrypt(kp, y)[0] == 0x24
