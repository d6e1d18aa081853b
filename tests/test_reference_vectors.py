"""Golden-vector exactness harness — the BASELINE.json acceptance criterion.

tests/golden/reference_vectors.json records decode vectors produced by the
exact host engine (toyfhe_tpu/core/host_engine.py) running the reference's
own literal parameter derivations — the same ``nextprime`` walks
(test/bfv_crt.jl:8-25, test/ckks_modswitch.jl:7-11), the same PALISADE
param-gen (src/bfv.jl:47-118), the PALISADE m=4096 BGV ring
(src/cryptparams.jl:24) — seeded end-to-end (tools/record_golden.py).

Two layers of protection:

* Device tests (default tier): the device RNS path — re-planned <2^31
  towers, BEHZ multiply, RNS/hybrid gadgets — must decode IDENTICALLY to
  the recorded vectors for the exact schemes (BFV/BGV: every coefficient,
  every keyswitch output length), and within documented tolerance for
  CKKS (both the golden run and the device run approximate the same
  plaintext arithmetic; the tolerance is the sum of the two suites'
  reference-asserted bounds).

* Host reproduction tests (slow tier): the host engine re-runs each
  scenario from the seed and must reproduce the JSON bit-exactly,
  guarding the recorder itself.
"""

import json
import os
from fractions import Fraction

import jax
import numpy as np
import pytest

import toyfhe_tpu as F
from toyfhe_tpu.core import golden as G
from toyfhe_tpu.core import ring as ringops
from toyfhe_tpu.utils import numtheory as nt

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "reference_vectors.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN_PATH) as f:
        data = json.load(f)
    assert data["seed"] == G.SEED
    return data["scenarios"]


def _expect(rec, xs):
    assert G.vec_matches(rec, xs), "decode diverged from golden vector"


def _coeffs(plain):
    return plain.coeffs


def _plain_vec(n, p):
    return np.random.default_rng(G.SEED).integers(0, p, size=n)


# ---------------------------------------------------------------------------
# device path vs goldens (default tier)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_device_bfv_triv(golden):
    g = golden["bfv_triv"]
    n = g["params"]["n"]
    params = F.bfv_params(53, eval_mult_count=2)
    assert params.ring_cipher.n == n, \
        "device param-gen diverged from the reference derivation"
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    kp = F.keygen(params, ks[0])
    pring = params.plaintext_space()

    c = F.encrypt(kp, F.scalar_encode(pring, 6), ks[1])
    _expect(g["checks"]["dec"], _coeffs(F.decrypt(kp, c)))
    _expect(g["checks"]["dec_sq"], _coeffs(F.decrypt(kp, F.ct_mul(c, c))))

    m = _plain_vec(n, 53)
    _expect(g["plain"]["vec"], m)          # same deterministic plaintext
    cv = F.encrypt(kp, F.coeff_encode(pring, m), ks[2])
    _expect(g["checks"]["vec_dec"], _coeffs(F.decrypt(kp, cv)))
    _expect(g["checks"]["vec_sq"], _coeffs(F.decrypt(kp, F.ct_mul(cv, cv))))


def test_device_bfv_keyswitch(golden):
    g = golden["bfv_keyswitch"]
    n = g["params"]["n"]
    params = F.bfv_params(7, eval_mult_count=3)
    assert params.ring_cipher.n == n
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    pring = params.plaintext_space()

    c1 = F.encrypt(kp, F.scalar_encode(pring, 2), ks[2])
    c1sq = F.ct_mul(c1, c1)
    _expect(g["checks"]["dec_sq"], _coeffs(F.decrypt(kp, c1sq)))
    cs = F.keyswitch(ek, c1sq)
    assert len(cs.cs) == 2                  # keyswitch length contract
    _expect(g["checks"]["dec_keyswitched"], _coeffs(F.decrypt(kp, cs)))
    _expect(g["checks"]["dec_mul_after_switch"],
            _coeffs(F.decrypt(kp, F.ct_mul(cs, c1))))

    m = _plain_vec(n, 7)
    _expect(g["plain"]["vec"], m)
    cv = F.encrypt(kp, F.coeff_encode(pring, m), ks[3])
    cvs = F.keyswitch(ek, F.ct_mul(cv, cv))
    assert len(cvs.cs) == 2
    _expect(g["checks"]["vec_sq_switched"], _coeffs(F.decrypt(kp, cvs)))


@pytest.mark.slow
def test_device_bfv_crt(golden):
    g = golden["bfv_crt"]
    n = g["params"]["n"]
    ring = F.make_rns_ring(n, (30, 29))
    last = max(ring.primes)
    aux_primes = []
    for _ in range(4):
        last = nt.next_prime(last + 2 * n, interval=2 * n)
        aux_primes.append(last)
    aux = F.make_ring(n, aux_primes)
    pring = F.PlainRing(n, 53)
    params = F.BFVParams(ring, aux, pring, 1, 3.2, delta=ring.modulus // 53)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    kp = F.keygen(params, ks[0])

    c = F.encrypt(kp, F.scalar_encode(pring, 6), ks[1])
    _expect(g["checks"]["dec"], _coeffs(F.decrypt(kp, c)))
    dsq = _coeffs(F.decrypt(kp, F.ct_mul(c, c)))
    # literal reference assertion (bfv_crt.jl:47); the golden's full
    # literal-ℛbig square wraps (see golden.run_bfv_crt docstring), the
    # device's BEHZ base does not — compare against the sound variant.
    assert int(dsq[0]) == g["checks"]["dec_sq0"] == 0x24
    _expect(g["checks"]["dec_sq_sound"], dsq)

    m = _plain_vec(n, 53)
    _expect(g["plain"]["vec"], m)
    cv = F.encrypt(kp, F.coeff_encode(pring, m), ks[2])
    _expect(g["checks"]["vec_sq"], _coeffs(F.decrypt(kp, F.ct_mul(cv, cv))))


def test_device_bgv_triv(golden):
    g = golden["bgv_triv"]
    n = g["params"]["n"]
    params = F.BGVParams(F.cryptparams.palisade_ring(4096), 256,
                         8 / (2 * np.pi) ** 0.5)
    assert params.ring_cipher.n == n
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    kp = F.keygen(params, ks[0])
    pring = params.plaintext_space()

    c = F.encrypt(kp, F.scalar_encode(pring, 6), ks[1])
    _expect(g["checks"]["dec"], _coeffs(F.decrypt(kp, c)))
    _expect(g["checks"]["dec_sq"], _coeffs(F.decrypt(kp, F.ct_mul(c, c))))

    m = _plain_vec(n, 256)
    _expect(g["plain"]["vec"], m)
    cv = F.encrypt(kp, F.coeff_encode(pring, m), ks[2])
    _expect(g["checks"]["vec_sq"], _coeffs(F.decrypt(kp, F.ct_mul(cv, cv))))


# CKKS: goldens are recorded at the reference's literal 40/60-bit towers;
# the device runs re-planned <2^31 towers. Both approximate the same
# plaintext arithmetic; the comparison tolerance is the sum of the
# reference assertion (golden-side error bound) and the device suite's
# own asserted bound at its re-planned tower.

def test_device_ckks_triv(golden):
    g = golden["ckks_triv"]
    n = g["params"]["n"]
    nslots = n // 2
    want = np.array([complex(r, i) for r, i in g["checks"]["dec_sq"]])
    ring = F.make_rns_ring(n, (30, 29, 29))
    params = F.CKKSParams(ring, 4, 3.2)
    scale = Fraction(2) ** 40
    vals = np.linspace(0.0, 1.0, nslots)
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    kp = F.keygen(params, ks[0])
    c = F.encrypt(kp, F.make_plaintext(ring, vals, scale), ks[1])
    got = F.decrypt(kp, F.ct_mul(c, c))
    # golden ≤1e-4 from truth (ckks_triv.jl:33) + device ≤1e-4
    assert np.max(np.abs(got - want)) < 2e-4


def test_device_ckks_modswitch(golden):
    g = golden["ckks_modswitch"]
    n = g["params"]["n"]
    want = np.array([complex(r, i) for r, i in g["checks"]["enc_modswitch"]])
    ring = F.make_rns_ring(n, (30, 29, 29))
    params = F.CKKSParams(ring, 4, 3.2)
    scale = Fraction(2) ** 55
    vals = np.full(n // 2, 2.0)
    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    kp = F.keygen(params, ks[0])
    c = F.encrypt(kp, F.make_plaintext(ring, vals, scale), ks[1])
    got = F.decrypt(kp, F.ct_rescale(c))
    # golden ≤1e-3 (ckks_modswitch.jl:33) + device ≤1e-3
    assert np.max(np.abs(got - want)) < 2e-3


def test_device_ckks_rotate(golden):
    g = golden["ckks_rotate"]
    n = g["params"]["n"]
    want_plain = np.array([complex(r, i) for r, i in g["checks"]["plain_galois3"]])
    want_rot = np.array([complex(r, i) for r, i in g["checks"]["enc_rotate_step1"]])
    ring = F.make_rns_ring(n, (30, 29))
    scale = Fraction(2) ** 40
    vals = np.arange(1, n // 2 + 1, dtype=np.complex128)
    vals[0] += 1j

    re = F.ckks_encode(ring, vals, scale)
    got = F.ckks_decode(ring, ringops.apply_galois(ring, re, 3), scale)
    assert np.max(np.abs(got - want_plain)) < 1e-5   # 1e-6 + 1e-6, rounded up

    params = F.CKKSParams(ring, 4, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    kp = F.keygen(params, ks[0])
    c = F.encrypt(kp, F.CKKSPlaintext(ring, vals, scale), ks[1])
    gk = F.keygen_galois(ks[2], kp.priv, steps=1)
    got = F.decrypt(kp, F.rotate(gk, c))
    # golden ≤1e-3 (noise at scale 2^60/40-bit tower) + device ≤1e-4
    assert np.max(np.abs(got - want_rot)) < 2e-3


def test_device_ckks_matmul(golden):
    g = golden["ckks_matmul"]
    n = g["params"]["n"]
    want = np.array([complex(r, i) for r, i in g["checks"]["matmul"]])
    ring = F.make_rns_ring(n, (30, 29, 29))
    scale = Fraction(2) ** 40
    vals = np.arange(1, n // 2 + 1, dtype=np.float64)
    W = np.ones((4, 4), dtype=np.float64)
    params = F.CKKSParams(ring, 4, 3.2)
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    kp = F.keygen(params, ks[0])
    c = F.encrypt(kp, F.make_plaintext(ring, vals, scale), ks[1])
    gk = F.keygen_galois(ks[2], kp.priv, steps=4)

    nrep = n // 2 // 4
    result = F.mul_plain_vector(c, np.tile(np.diag(W), nrep))
    rotated = c
    for k in range(1, 4):
        rotated = F.rotate(gk, rotated)
        diag = np.diag(np.roll(W, k, axis=1))
        result = F.ct_add(result, F.mul_plain_vector(rotated, np.tile(diag, nrep)))
    got = F.decrypt(kp, result)
    # golden ≤1e-5 (ckks_matmul.jl:44) + device ≤1e-5
    assert np.max(np.abs(got - want)) < 2e-5


def test_device_bfv_simd(golden):
    """test/bfv_simd.jl on the device path: NTT SlotEncoding at p=65537,
    slot products EXACTLY equal to the recorded golden slots (BFV is an
    exact scheme; the slot order is the shared plaintext-field NTT)."""
    g = golden["bfv_simd"]
    n = g["params"]["n"]
    params = F.bfv_params(65537, eval_mult_count=1)
    assert params.ring_cipher.n == n, \
        "device param-gen diverged from the reference derivation"
    pring = params.plaintext_space()
    ks = jax.random.split(jax.random.PRNGKey(8), 3)
    kp = F.keygen(params, ks[0])

    s1 = np.zeros(n, dtype=np.int64)
    s1[0] = s1[1] = 1
    s2 = np.full(n, 10, dtype=np.int64)
    s2[0] = 5
    c1 = F.encrypt(kp, F.slot_encode(pring, s1), ks[1])
    c2 = F.encrypt(kp, F.slot_encode(pring, s2), ks[2])
    dec = F.slot_decode(F.decrypt(kp, F.ct_mul(c1, c2)))
    assert dec[0] == 5 and dec[1] == 10 and not np.any(dec[2:])
    _expect(g["checks"]["slots_mul"], dec)

    sv = np.random.default_rng(G.SEED).integers(0, 65537, size=n)
    _expect(g["plain"]["slots"], sv)
    cv = F.encrypt(kp, F.slot_encode(pring, sv), ks[1])
    decv = F.slot_decode(F.decrypt(kp, F.ct_mul(cv, cv)))
    _expect(g["checks"]["vec_slots_sq"], decv)


def test_device_ckks_modraise(golden):
    """test/ckks_modraise.jl on the device path: ModulusRaised keyswitch
    round-trip at the re-planned tower vs the golden decode (reference
    bound 1e-8 + the device suite's own ≤1e-9 bound)."""
    g = golden["ckks_modraise"]
    n = g["params"]["n"]
    want = np.array([complex(r, i) for r, i in g["checks"]["roundtrip"]])
    ring = F.make_rns_ring(n, (30, 29, 29))
    params = F.ModulusRaised(F.CKKSParams(ring, 0, 3.2))
    scale = Fraction(2) ** 40
    vals = np.arange(1, n // 2 + 1, dtype=np.float64)
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    kp = F.keygen(params, ks[0])
    c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals, scale),
                  ks[1])
    ek = F.make_eval_key(ks[2], kp.priv.secret, kp.priv)
    got = F.decrypt(kp, F.keyswitch(ek, c))
    assert np.max(np.abs(got - want)) < 2e-8


def test_device_ckks_device_tower_bitexact(golden):
    """Device-tower goldens: the host engine recorded ciphertext, keys
    and raw decrypt integers AT the device's own <2^31 tower; the device
    engine imports the material, runs square → RNS keyswitch → rescale,
    and the raw decrypted integers must match BIT-exactly — every CKKS
    device op pinned integer-for-integer, no float tolerances."""
    import jax.numpy as jnp

    from toyfhe_tpu.core import rlwe

    g = golden["ckks_device_tower"]
    n = g["params"]["n"]
    tower = [int(h, 16) for h in g["params"]["tower"]]
    ring = F.make_ring(n, tower)
    assert ring.primes == tower, "device prime walk diverged"
    params = F.CKKSParams(ring, 0, 3.2)

    unhex = lambda xs: [int(h, 16) for h in xs]
    imp = lambda xs: F.RingElt(primal=jnp.asarray(ring.from_bigint(unhex(xs))))
    secret = imp(g["material"]["secret"])
    kp = rlwe.PrivKey(params, secret)
    cs = tuple(imp(comp) for comp in g["material"]["ct"])
    c = F.CipherText(params, cs, ring)
    comps = [rlwe.KeyComponent(mask=imp(m), masked=imp(md))
             for m, md in zip(g["material"]["ek_masks"],
                              g["material"]["ek_maskeds"])]
    ek = rlwe.EvalMultKey(rlwe.KeySwitchKey(params, comps, ring))

    out = F.ct_rescale(F.keyswitch(ek, F.ct_mul(c, c)))
    raw = ringops.ensure_primal(out.ring, F.decrypt_raw(kp, out))
    ints = out.ring.to_bigint(np.asarray(raw.primal))
    _expect(g["checks"]["raw_rescaled"], ints)


def test_device_polycrt_encoding(golden):
    """test/polycrt_encoding.jl on the designated backend (host PolyCRT
    — the FLINT role stays host-side per SURVEY §2.8): recorded encode
    polynomial and slot round-trip, exactly."""
    from toyfhe_tpu.core.polycrt import PolyCRTContext

    g = golden["polycrt_encoding"]
    ctx = PolyCRTContext(g["params"]["m"], g["params"]["p"])
    slots = [[1, 1, 0], [1, 0, 1]]
    coeffs = ctx.encode(slots)
    _expect(g["checks"]["encoded_poly"], coeffs)
    assert ctx.decode(coeffs) == g["checks"]["decoded_slots"]


# ---------------------------------------------------------------------------
# host engine reproduces the recording bit-exactly (slow tier)
# ---------------------------------------------------------------------------

_FAST_HOST = ["ckks_rotate", "ckks_modswitch", "ckks_matmul", "bgv_triv",
              "bfv_crt", "polycrt_encoding", "bfv_uint8", "ckks_modraise",
              "ckks_device_tower"]
# ckks_bootstrap re-runs the full device refresh (~3-5 min on this host)
_SLOW_HOST = ["bfv_triv", "bfv_keyswitch", "ckks_triv", "bfv_simd",
              "bfv_noise", "ckks_bootstrap"]


def test_bootstrap_golden_recorded(golden):
    """Default-tier guard for the bootstrap golden pin (round-3 VERDICT
    item 7): the recorded scenario must exist, carry the full bit-exact
    residue records for both ciphertext components, and its recorded
    refresh error must sit in the healthy band. The full bit-exact
    replay runs in the slow tier (test_host_reproduces_golden_slow
    [ckks_bootstrap])."""
    g = golden["ckks_bootstrap"]
    assert g["params"]["radix"] == 16 and g["params"]["double_angle"] == 2
    assert g["params"]["out_levels"] >= 6
    for key in ("ct_c0", "ct_c1"):
        rec = g["checks"][key]
        assert ("full" in rec) or ("sha256" in rec and rec["prefix"])
    assert 0 < g["checks"]["err_vs_input"] < 2e-2
    assert len(g["checks"]["decoded"]) == g["params"]["n"] // 2


def _assert_scenario_reproduced(golden, name):
    got = G.SCENARIOS[name](G.SEED)
    want = golden[name]
    assert got["params"] == want["params"], "parameter derivation drifted"
    assert set(got["checks"]) == set(want["checks"])
    for key, rec in want["checks"].items():
        grec = got["checks"][key]
        if (isinstance(rec, list) and rec and isinstance(rec[0], list)
                and len(rec[0]) == 2 and isinstance(rec[0][0], float)):
            # complex slots: float64-exact replay
            assert G.cvec_err(rec, [complex(r, i) for r, i in grec]) == 0.0, \
                f"{name}.{key} diverged"
        else:   # exact integers / scalars / dict traces (json-exact)
            assert grec == rec, f"{name}.{key} diverged"
    if "material" in want:
        assert got["material"] == want["material"], \
            f"{name} recorded key/ciphertext material diverged"


@pytest.mark.parametrize("name", _FAST_HOST)
def test_host_reproduces_golden(golden, name):
    _assert_scenario_reproduced(golden, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", _SLOW_HOST)
def test_host_reproduces_golden_slow(golden, name):
    _assert_scenario_reproduced(golden, name)
