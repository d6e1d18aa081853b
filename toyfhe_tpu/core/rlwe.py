"""Scheme-generic RLWE SHE engine (layer L3).

TPU-native rebuild of ``/root/reference/src/rlwe_she.jl`` (392 LoC): one
implementation of keygen / encrypt / decrypt / add / mul / keyswitch /
rotate serves BFV, BGV and CKKS. A scheme is a :class:`SchemeParams`
subclass supplying the four scheme functions — encoder π⁻¹, decoder π,
noise distribution 𝒩, secret distribution 𝒢 (``rlwe_she.jl:9-16``) — plus
ring accessors and the two optional multiplication hooks
``mul_expand`` / ``mul_contract`` (``rlwe_she.jl:39-40``).

Differences from the reference, by TPU-first design:
  * explicit ``jax.random`` keys everywhere (no global RNG);
  * key-switch decomposition is a per-limb gadget that unifies the
    reference's two paths (``rlwe_she.jl:327-338``): ``relin_window = 0``
    is pure RNS-basis decomposition with centered digits (crt.jl default,
    ``crt.jl:298``), ``relin_window = w > 0`` decomposes **each RNS
    residue** into base-2^w digits — on a single-limb tower this is
    exactly the reference's power-of-2 digit path, and on RNS towers it
    is the standard hybrid gadget that keeps key-switch noise at 2^w
    instead of q_i. All digit tensors are static-shaped and batched into
    one NTT call.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import modmath, sampling
from ..ops.modmath import MontParams
from . import ring as R
from .ring import RingContext, RingElt


class UsageError(Exception):
    """Parameter-mixing and invariant violations (rlwe_she.jl:223-225)."""


# ---------------------------------------------------------------------------
# SchemeParams protocol + passthrough wrappers (rlwe_she.jl:9-61)
# ---------------------------------------------------------------------------

class SchemeParams:
    """Base protocol. Subclasses define the four scheme functions."""

    relin_window: int = 0

    # ring accessors (rlwe_she.jl:18-34)
    @property
    def ring_cipher(self) -> RingContext:
        raise NotImplementedError

    @property
    def ring_key(self) -> RingContext:
        return self.ring_cipher

    def plaintext_space(self):
        raise NotImplementedError

    # π⁻¹ : plaintext -> RingElt in ring_cipher
    def encode(self, plaintext) -> RingElt:
        raise NotImplementedError

    # π : RingElt -> native plaintext (host side)
    def decode(self, b: RingElt, ring: RingContext):
        raise NotImplementedError

    # 𝒩 : noise sampler over the given ring
    def noise(self, key, ring: RingContext, batch=()) -> RingElt:
        raise NotImplementedError

    # 𝒢 : secret/ephemeral sampler
    def secret_sampler(self, key, ring: RingContext, batch=()) -> RingElt:
        raise NotImplementedError

    # optional multiplication hooks (rlwe_she.jl:39-40)
    def mul_expand_pair(self, c1: "CipherText", c2: "CipherText"):
        return c1.ring, (c1.cs, c2.cs)

    def mul_contract_pair(self, ring: RingContext, cs: Sequence[RingElt]):
        return ring, tuple(cs)

    def scheme_name(self) -> str:
        return type(self).__name__


class PassthroughParams(SchemeParams):
    """Composable scheme modifier (rlwe_she.jl:52-61): delegate everything
    to ``self.params``, override selectively. Unknown attributes (scheme
    hooks like ``keyswitch_expand``, scheme fields like ``delta``) fall
    through to the wrapped params via ``__getattr__``."""

    def __init__(self, params: SchemeParams):
        self.params = params

    @property
    def parent(self) -> SchemeParams:
        return self.params

    @property
    def ring_cipher(self):
        return self.params.ring_cipher

    @property
    def ring_key(self):
        return self.params.ring_key

    @property
    def relin_window(self):
        return self.params.relin_window

    def plaintext_space(self):
        return self.params.plaintext_space()

    def encode(self, plaintext, ring=None):
        # encode at the WRAPPER's ciphertext tower: raising modifiers
        # encrypt one or more limbs short of the base scheme's ring
        return self.params.encode(plaintext,
                                  ring=ring if ring is not None
                                  else self.ring_cipher)

    def decode(self, b, ring):
        return self.params.decode(b, ring)

    def noise(self, key, ring, batch=()):
        return self.params.noise(key, ring, batch)

    def secret_sampler(self, key, ring, batch=()):
        return self.params.secret_sampler(key, ring, batch)

    def mul_expand_pair(self, c1, c2):
        return self.params.mul_expand_pair(c1, c2)

    def mul_contract_pair(self, ring, cs):
        return self.params.mul_contract_pair(ring, cs)

    def scheme_name(self):
        return self.params.scheme_name()

    def __getattr__(self, name):
        if name == "params":
            raise AttributeError(name)
        return getattr(self.params, name)


# ---------------------------------------------------------------------------
# Key and ciphertext types (rlwe_she.jl:67-149)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PrivKey:
    params: SchemeParams
    secret: RingElt          # lives in ring_key


@dataclasses.dataclass
class KeyComponent:
    mask: RingElt
    masked: RingElt


@dataclasses.dataclass
class PubKey:
    params: SchemeParams
    key: KeyComponent


@dataclasses.dataclass
class KeySwitchKey:
    params: SchemeParams
    key: List[KeyComponent]  # one per gadget digit
    ring: RingContext        # ring the key elements live in


@dataclasses.dataclass
class EvalMultKey:
    key: KeySwitchKey


@dataclasses.dataclass
class GaloisKey:
    galois_element: int
    key: KeySwitchKey


@dataclasses.dataclass
class GaloisKeys:
    """Collection of galois keys for various rotation steps
    (rlwe_she.jl:105-109), addressable by galois element."""

    keys: List[GaloisKey]

    def for_element(self, galois_element: int) -> GaloisKey:
        # O(1) lookup via a lazily-built index. Stored outside the
        # dataclass fields so pytree unflatten (which passes only
        # ``keys``) and dataclass equality are unaffected; rebuilt if
        # the key list changed length (e.g. after unflatten reuse).
        idx = self.__dict__.get("_index")
        if idx is None or len(idx) != len(self.keys):
            idx = {k.galois_element: k for k in self.keys}
            self.__dict__["_index"] = idx
        try:
            return idx[galois_element]
        except KeyError:
            raise KeyError(
                f"no galois key for element {galois_element}") from None

    def for_steps(self, n: int, steps: int) -> GaloisKey:
        return self.for_element(galois_element_for_steps(n, steps))


@dataclasses.dataclass
class KeyPair:
    priv: PrivKey
    pub: PubKey


@dataclasses.dataclass
class CipherText:
    """N-tuple of ring elements + static metadata.

    ``enc`` is the plaintext-encoding tag applied on decryption — the
    role the ``Enc`` type parameter plays at ``rlwe_she.jl:131-149``.
    ``ring`` tracks the (possibly modswitched) tower the components live
    in.
    """
    params: SchemeParams
    cs: Tuple[RingElt, ...]
    ring: RingContext
    enc: Any = None

    def __len__(self):
        return len(self.cs)

    def __getitem__(self, i):
        return self.cs[i]


# ---------------------------------------------------------------------------
# pytree registration — the whole eager API is jax.jit-compilable
# ---------------------------------------------------------------------------
#
# Ciphertexts and keys flatten to their ring-element arrays with the
# static metadata (params / ring / tags — all identity- or value-hashed)
# as aux data, so user pipelines written against the public API compose
# under jit/vmap/shard_map:
#
#     step = jax.jit(lambda ek, c: ct_rescale(keyswitch(ek, ct_mul(c, c))))
#
# This is the serving-speed front-end the reference (op-by-op Julia)
# has no analogue of; bit-exactness vs eager is tests/test_jit_api.py.

def _register(cls, fields, aux_fields):
    def flatten(obj):
        return (tuple(getattr(obj, f) for f in fields),
                tuple(getattr(obj, f) for f in aux_fields))

    def unflatten(aux, children):
        return cls(**dict(zip(aux_fields, aux)), **dict(zip(fields, children)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


def _register_list(cls, list_field, aux_fields):
    def flatten(obj):
        return (tuple(getattr(obj, list_field)),
                tuple(getattr(obj, f) for f in aux_fields))

    def unflatten(aux, children):
        return cls(**dict(zip(aux_fields, aux)),
                   **{list_field: list(children)})

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


_register(PrivKey, ("secret",), ("params",))
_register(KeyComponent, ("mask", "masked"), ())
_register(PubKey, ("key",), ("params",))
_register_list(KeySwitchKey, "key", ("params", "ring"))
_register(EvalMultKey, ("key",), ())
_register(GaloisKey, ("key",), ("galois_element",))
_register_list(GaloisKeys, "keys", ())
_register(KeyPair, ("priv", "pub"), ())


def _ct_flatten(c: CipherText):
    return c.cs, (c.params, c.ring, c.enc)


def _ct_unflatten(aux, cs):
    return CipherText(aux[0], tuple(cs), aux[1], enc=aux[2])


jax.tree_util.register_pytree_node(CipherText, _ct_flatten, _ct_unflatten)


# ---------------------------------------------------------------------------
# Key generation (rlwe_she.jl:155-170)
# ---------------------------------------------------------------------------

def keygen(params: SchemeParams, rng) -> KeyPair:
    ring = params.ring_key
    k1, k2, k3 = jax.random.split(rng, 3)
    mask = RingElt(primal=sampling.uniform(k1, ring.mp, ring.n))
    secret = params.secret_sampler(k2, ring)
    error = params.noise(k3, ring)
    # masked = -(mask*secret + error)
    masked = R.neg(ring, R.add(ring, R.mul(ring, mask, secret), error))
    return KeyPair(
        PrivKey(params, secret),
        PubKey(params, KeyComponent(mask=mask, masked=masked)))


# ---------------------------------------------------------------------------
# Encryption / decryption (rlwe_she.jl:176-217)
# ---------------------------------------------------------------------------

def encrypt_zero(pub: PubKey, rng) -> CipherText:
    params = pub.params
    # ModulusRaised overrides this (modulusraising.jl:23-26)
    hook = getattr(params, "encrypt_zero", None)
    if hook is not None:
        return hook(pub, rng)
    return _encrypt_zero_at(params, params.ring_cipher, pub.key, rng)


def _encrypt_zero_at(params: SchemeParams, ring: RingContext,
                     key: KeyComponent, rng) -> CipherText:
    k1, k2, k3 = jax.random.split(rng, 3)
    u = params.secret_sampler(k1, ring)
    e1 = params.noise(k2, ring)
    e2 = params.noise(k3, ring)
    c1 = R.add(ring, R.mul(ring, key.masked, u), e1)
    c2 = R.add(ring, R.mul(ring, key.mask, u), e2)
    return CipherText(params, (c1, c2), ring)


def encrypt(key, plaintext, rng) -> CipherText:
    """encrypt(kp|pub, plaintext) — encode with π⁻¹ then add to a fresh
    encryption of zero (rlwe_she.jl:188-195)."""
    pub = key.pub if isinstance(key, KeyPair) else key
    params = pub.params
    c = encrypt_zero(pub, rng)
    pt, enc_tag = _encode_with_tag(params, plaintext)
    cs = (R.add(c.ring, c.cs[0], pt),) + c.cs[1:]
    return CipherText(params, cs, c.ring, enc=enc_tag)


def _encode_with_tag(params, plaintext):
    """Returns (RingElt, decode-tag). Encoding objects know how to encode
    themselves; raw RingElts pass through untagged."""
    if isinstance(plaintext, RingElt):
        return plaintext, None
    if hasattr(plaintext, "to_ring"):
        return plaintext.to_ring(params), plaintext.decode_tag(params)
    return params.encode(plaintext), None


def decrypt(key, c: CipherText):
    """b = Σ cᵢ·sⁱ, then π, then the encoding's decode (rlwe_she.jl:199-217)."""
    priv = key.priv if isinstance(key, KeyPair) else key
    params = priv.params
    ring = c.ring
    secret = priv.secret
    skr = params.ring_key
    # auto-align secret to the ciphertext tower (rlwe_she.jl:202-204)
    while skr.nlimbs > ring.nlimbs:
        skr, secret = R.modswitch_drop(skr, secret)
    if skr.primes != ring.primes:
        raise UsageError("secret/ciphertext tower mismatch")

    b = c.cs[0]
    spow = secret
    for i in range(1, len(c.cs)):
        b = R.add(ring, b, R.mul(ring, spow, c.cs[i]))
        if i + 1 < len(c.cs):
            spow = R.mul(ring, spow, secret)
    dec = params.decode(b, ring)
    if c.enc is not None:
        return c.enc.decode(params, dec, ring)
    return dec


def decrypt_raw(key, c: CipherText) -> RingElt:
    """Σ cᵢ·sⁱ without π — for noise instrumentation (bfv.jl:136-164)."""
    priv = key.priv if isinstance(key, KeyPair) else key
    ring = c.ring
    secret = priv.secret
    skr = priv.params.ring_key
    while skr.nlimbs > ring.nlimbs:
        skr, secret = R.modswitch_drop(skr, secret)
    b = c.cs[0]
    spow = secret
    for i in range(1, len(c.cs)):
        b = R.add(ring, b, R.mul(ring, spow, c.cs[i]))
        if i + 1 < len(c.cs):
            spow = R.mul(ring, spow, secret)
    return b


# ---------------------------------------------------------------------------
# Homomorphic arithmetic (rlwe_she.jl:231-266)
# ---------------------------------------------------------------------------

def ct_add(c1: CipherText, c2: CipherText) -> CipherText:
    return _ct_addsub(c1, c2, R.add)


def ct_sub(c1: CipherText, c2: CipherText) -> CipherText:
    return _ct_addsub(c1, c2, R.sub)


def _ct_addsub(c1, c2, op):
    if c1.params is not c2.params:
        raise UsageError("Attempting to add ciphertexts with differing parameters")
    ring = c1.ring
    n1, n2 = len(c1), len(c2)
    cs = []
    for i in range(max(n1, n2)):
        if i >= n1:
            cs.append(c2.cs[i])
        elif i >= n2:
            cs.append(c1.cs[i])
        else:
            cs.append(op(ring, c1.cs[i], c2.cs[i]))
    enc = c1.enc if c1.enc is not None else c2.enc
    if c1.enc is not None and c2.enc is not None:
        enc = c1.enc.combine_add(c2.enc)
    return CipherText(c1.params, tuple(cs), ring, enc=enc)


def ct_add_ring(c: CipherText, b: RingElt) -> CipherText:
    """c + plaintext ring element (rlwe_she.jl:243-245)."""
    cs = (R.add(c.ring, c.cs[0], b),) + c.cs[1:]
    return CipherText(c.params, cs, c.ring, enc=c.enc)


def enc_mul(c1: CipherText, c2: CipherText) -> Tuple[RingContext, Tuple[RingElt, ...]]:
    """Tensor product with scheme expand/contract hooks (rlwe_she.jl:247-262)."""
    if c1.params is not c2.params:
        raise UsageError("Attempting to multiply ciphertexts with differing parameters")
    from ..utils import metrics
    metrics.count("enc_mul")
    params = c1.params
    ring, (a, b) = params.mul_expand_pair(c1, c2)
    out: List[Optional[RingElt]] = [None] * (len(a) + len(b) - 1)
    for i in range(len(a)):
        for j in range(len(b)):
            t = R.mul(ring, a[i], b[j])
            out[i + j] = t if out[i + j] is None else R.add(ring, out[i + j], t)
    return params.mul_contract_pair(ring, out)


def ct_mul(c1: CipherText, c2: CipherText) -> CipherText:
    ring, cs = enc_mul(c1, c2)
    enc = None
    if c1.enc is not None and c2.enc is not None:
        enc = c1.enc.combine_mul(c2.enc)
    return CipherText(c1.params, cs, ring, enc=enc)


# ---------------------------------------------------------------------------
# Gadget decomposition + key switching (rlwe_she.jl:271-349)
# ---------------------------------------------------------------------------

def _gadget_shape(ring: RingContext, window: int) -> Tuple[int, int]:
    """(digits per limb K, total digits L*K) for the unified gadget."""
    if window == 0:
        return 1, ring.nlimbs
    maxbits = max(p.bit_length() for p in ring.primes)
    k = -(-maxbits // window)
    return k, ring.nlimbs * k


def gadget_factors(ring: RingContext, window: int) -> List[int]:
    """Integer factor g_{ik} each key digit is multiplied by:
    (q/q_i)·[(q/q_i)^{-1}]_{q_i} · 2^{w·k}  (mod q)."""
    q = ring.modulus
    out = []
    k, _ = _gadget_shape(ring, window)
    for i, qi in enumerate(ring.primes):
        qhat = q // qi
        resid = qhat * pow(qhat % qi, -1, qi) % q
        for kk in range(k):
            out.append(resid * pow(2, window * kk, q) % q if window else resid)
    return out


def gadget_decompose(ring: RingContext, target: RingContext, x: RingElt,
                     window: int, k_per_limb: Optional[int] = None) -> jnp.ndarray:
    """Decompose x (primal, in ``ring``) into digit ring elements embedded
    in ``target``'s tower. Returns primal tensor uint32[ndig, Lt, N].

    window == 0: centered RNS digits (rlwe_she.jl:327-330);
    window  > 0: raw base-2^w digits of each residue (rlwe_she.jl:331-338
    generalized per-limb). ``k_per_limb`` must match the digit count the
    key was generated with (from the key's decomposition ring — after
    modswitch drops the current tower's max prime may be smaller, and the
    digit/key pairing must stay aligned)."""
    x = R.ensure_primal(ring, x)
    p = x.primal                      # [L, N]
    mp_t = target.mp
    digs = []
    if window == 0:
        for i in range(ring.nlimbs):
            lift = modmath.centered(p[..., i:i + 1, :], ring.mp.select([i]))
            digs.append(modmath.from_signed(
                jnp.broadcast_to(lift, p.shape[:-2] + (target.nlimbs, ring.n)), mp_t))
    else:
        k = k_per_limb if k_per_limb is not None else _gadget_shape(ring, window)[0]
        mask = np.uint32((1 << window) - 1)
        for i in range(ring.nlimbs):
            xi = p[..., i:i + 1, :]
            for kk in range(k):
                d = (xi >> np.uint32(window * kk)) & mask
                digs.append(jnp.broadcast_to(
                    d, p.shape[:-2] + (target.nlimbs, ring.n)).astype(jnp.uint32))
    return jnp.stack(digs, axis=0)


def make_eval_key(rng, old: RingElt, new: PrivKey,
                  key_params: Optional[SchemeParams] = None) -> KeySwitchKey:
    """Key-switching key old→new.secret (rlwe_she.jl:273-298).

    ``old`` is a ring element in new's key ring (e.g. s² or σ(s)).
    Scheme modifiers that pre-scale the old key apply their lift HERE —
    exactly as the reference's dispatch on ``PrivKey{<:ModulusRaised}``
    multiplies pₛ·old inside make_eval_key (modulusraising.jl:28-32) —
    so a direct call with the raw secret (test/ckks_modraise.jl:30)
    builds a usable key.
    """
    params = key_params if key_params is not None else new.params
    gen_params = new.params
    ring = gen_params.ring_key
    hook = getattr(gen_params, "lift_old_key", None)
    if hook is not None:
        old = hook(old)
    window = params.relin_window
    # digit ring: decomposition happens over the *ciphertext* tower; keys
    # are generated over the full key tower. Factors are taken over the
    # decomposition ring's modulus.
    dec_ring = params.ring_cipher if _is_modraised(params) else ring
    hfac = getattr(params, "hybrid_factors", None)
    factors = hfac() if hfac is not None else gadget_factors(dec_ring, window)

    old = R.ensure_primal(ring, old)
    comps: List[KeyComponent] = []
    for g in factors:
        rng, k1, k2 = jax.random.split(rng, 3)
        mask = RingElt(primal=sampling.uniform(k1, ring.mp, ring.n))
        e = gen_params.noise(k2, ring)
        ga = R.scalar_mul(ring, g % ring.modulus, old)
        masked = R.sub(ring, ga, R.add(ring, R.mul(ring, mask, new.secret), e))
        comps.append(KeyComponent(mask=mask, masked=masked))
    return KeySwitchKey(params, comps, ring)


def _is_modraised(params) -> bool:
    from .modraise import ModulusRaised
    return isinstance(params, ModulusRaised)


def keygen_eval_mult(rng, priv: PrivKey) -> EvalMultKey:
    ring = priv.params.ring_key
    s2 = R.mul(ring, priv.secret, priv.secret)
    return EvalMultKey(make_eval_key(rng, s2, priv))


def galois_element_for_steps(n: int, steps: int) -> int:
    """3^(2N−steps) for steps>0 else 3^(−steps), mod 2N (rlwe_she.jl:304)."""
    m = 2 * n
    if steps > 0:
        return pow(3, 2 * n - steps, m)
    return pow(3, -steps, m)


def keygen_galois_set(rng, priv: PrivKey, steps_list) -> GaloisKeys:
    """Generate a set of rotation keys (GaloisKeys, rlwe_she.jl:105-109)."""
    keys = []
    for s in steps_list:
        rng, k = jax.random.split(rng)
        keys.append(keygen_galois(k, priv, steps=s))
    return GaloisKeys(keys)


def keygen_galois(rng, priv: PrivKey, steps: Optional[int] = None,
                  galois_element: Optional[int] = None) -> GaloisKey:
    assert (steps is None) != (galois_element is None)
    ring = priv.params.ring_key
    if galois_element is None:
        galois_element = galois_element_for_steps(ring.n, steps)
    sg = R.apply_galois(ring, priv.secret, galois_element)
    return GaloisKey(galois_element, make_eval_key(rng, sg, priv))


def _mod_sum(terms: jnp.ndarray, mp: MontParams) -> jnp.ndarray:
    """Tree-reduce sum over axis 0 with modular adds."""
    k = terms.shape[0]
    while k > 1:
        half = k // 2
        lo = terms[:half]
        hi = terms[half:2 * half]
        red = modmath.add_mod(lo, hi, mp)
        if k % 2:
            red = jnp.concatenate([red, terms[2 * half:]], axis=0)
        terms = red
        k = terms.shape[0]
    return terms[0]


def keyswitch(ek, c: CipherText) -> CipherText:
    """Key switch c's last component back onto the base secret
    (rlwe_she.jl:315-347). Handles both gadget paths and the ModulusRaised
    expand/contract hooks."""
    if isinstance(ek, (EvalMultKey, GaloisKey)):
        ek = ek.key
    params = ek.params
    assert len(c.cs) in (2, 3)
    ring = c.ring

    if getattr(params, "hybrid_decompose", None) is not None:
        return _keyswitch_hybrid(params, ek, c)

    expand = getattr(params, "keyswitch_expand", None)
    contract = getattr(params, "keyswitch_contract", None)

    if expand is not None:
        exp_ring, c1 = expand(ring, c.cs[0])
        _, c2 = (exp_ring, R.zero_like(exp_ring, c1)) if len(c.cs) == 2 \
            else expand(ring, c.cs[1])
    else:
        exp_ring, c1 = ring, c.cs[0]
        c2 = c.cs[1] if len(c.cs) == 3 else None

    window = params.relin_window
    key_dec_ring = params.ring_cipher if _is_modraised(params) else ek.ring
    kpl = _gadget_shape(key_dec_ring, window)[0] if window else None
    digits = gadget_decompose(ring, exp_ring, c.cs[-1], window,
                              k_per_limb=kpl)                    # [ndig, Lt, N]
    from ..ops import ntt as nttmod
    from ..utils import metrics
    metrics.count("keyswitch")
    metrics.count("ntt_limb_transform", int(digits.shape[0]) * exp_ring.nlimbs)
    ddual = nttmod.ntt(exp_ring.tables, digits)

    # select key limbs matching the (expanded) ciphertext tower; after
    # modswitch drops, only the first ndig gadget components apply
    # (downswitch_keyelement, crt.jl:238-244)
    masks, maskeds = _downswitch_stack(params, ek, exp_ring, int(digits.shape[0]))
    # batched ciphertexts carry leading axes between the digit and limb
    # axes — insert singleton dims so the key stacks broadcast
    extra = ddual.ndim - 3
    if extra:
        shp = masks.shape[:1] + (1,) * extra + masks.shape[1:]
        masks = masks.reshape(shp)
        maskeds = maskeds.reshape(shp)
    mp = exp_ring.mp
    acc2 = _mod_sum(modmath.mul_mod(masks, ddual, mp), mp)
    acc1 = _mod_sum(modmath.mul_mod(maskeds, ddual, mp), mp)

    c1 = R.add(exp_ring, R.ensure_dual(exp_ring, c1), RingElt(dual=acc1))
    if c2 is None:
        c2 = RingElt(dual=acc2)
    else:
        c2 = R.add(exp_ring, R.ensure_dual(exp_ring, c2), RingElt(dual=acc2))

    if contract is not None:
        out_ring, c1 = contract(exp_ring, c1)
        _, c2 = contract(exp_ring, c2)
    else:
        out_ring = exp_ring
    return CipherText(c.params, (c1, c2), out_ring, enc=c.enc)


def _keyswitch_hybrid(params, ek: KeySwitchKey, c: CipherText) -> CipherText:
    """dnum-grouped hybrid key-switch (core/hybrid.py): digits are limb
    GROUPS fast-base-converted into the Q_t ∪ P tower; the accumulator
    alone is divided by P (the base components are never pre-scaled)."""
    from ..utils import metrics

    ring = c.ring
    metrics.count("keyswitch")
    exp_ring, ddual = params.hybrid_decompose_dual(ring, c.cs[-1])

    masks, maskeds = _hybrid_key_stack(params, ek, exp_ring,
                                       int(ddual.shape[0]), ddual.ndim - 3)
    mp = exp_ring.mp
    acc2 = _mod_sum(modmath.mul_mod(masks, ddual, mp), mp)
    acc1 = _mod_sum(modmath.mul_mod(maskeds, ddual, mp), mp)

    # one stacked contraction: the fused ModDown's transforms batch over
    # both accumulator components in a single NTT call
    out_ring, a = params.hybrid_contract(
        exp_ring, RingElt(dual=jnp.stack([acc1, acc2], axis=0)))
    if a.dual is not None:
        a1, a2 = RingElt(dual=a.dual[0]), RingElt(dual=a.dual[1])
    else:                       # sequential fallback returned primal
        a1, a2 = RingElt(primal=a.primal[0]), RingElt(primal=a.primal[1])
    assert out_ring is ring
    c1 = R.add(ring, c.cs[0], a1)
    c2 = a2 if len(c.cs) == 2 else R.add(ring, c.cs[1], a2)
    return CipherText(c.params, (c1, c2), ring, enc=c.enc)


def _downswitch_stack(params, ek: KeySwitchKey, target: RingContext, ndig: int):
    """Stack key components as dual tensors [ndig, Lt, N], restricted to
    the target tower (downswitch_keyelement, crt.jl:238-244 /
    modulusraising.jl:43-49)."""
    key_ring = ek.ring
    if _is_modraised(params):
        which = list(range(target.nlimbs - 1)) + [key_ring.nlimbs - 1]
    else:
        which = list(range(target.nlimbs))
    masks, maskeds = [], []
    for comp in ek.key[:ndig]:
        _, m = R.limb_select(key_ring, R.ensure_dual(key_ring, comp.mask), which)
        _, md = R.limb_select(key_ring, R.ensure_dual(key_ring, comp.masked), which)
        masks.append(m.dual)
        maskeds.append(md.dual)
    return jnp.stack(masks, 0), jnp.stack(maskeds, 0)


# ---------------------------------------------------------------------------
# Rotations (rlwe_she.jl:355-360)
# ---------------------------------------------------------------------------

def apply_galois_ct(c: CipherText, galois_element: int) -> CipherText:
    cs = tuple(R.apply_galois(c.ring, x, galois_element) for x in c.cs)
    return CipherText(c.params, cs, c.ring, enc=c.enc)


def rotate(gk, c: CipherText, steps: Optional[int] = None) -> CipherText:
    """Slot rotation = galois apply + key switch (rlwe_she.jl:355-360).
    Accepts a GaloisKey, or a GaloisKeys collection with ``steps``."""
    if isinstance(gk, GaloisKeys):
        gk = gk.for_steps(c.ring.n, steps)
    from ..utils import metrics
    metrics.count("rotate")
    return keyswitch(gk, apply_galois_ct(c, gk.galois_element))


class _HoistGadget:
    """Gadget adapter for the hoisted-rotation paths (:func:`rotate_many`
    / :func:`rotate_sum`). Valid only where σ_g commutes with the digit
    map: the hybrid gadget and centered-RNS digits (relin_window == 0 —
    odd primes make the centered lift an odd function, so the signed
    coefficient permutation passes through the decomposition AND through
    the ModulusRaised expand, which is a per-coefficient scalar multiply).
    Raw base-2^w windowed digits are UNSIGNED (rlwe_she.jl:331-338) and
    do not commute — those params fall back to per-rotation rotate()."""

    def __init__(self, params, ring: RingContext):
        self.params = params
        self.ring = ring
        self.hybrid = getattr(params, "hybrid_decompose", None) is not None
        self.exp_ring: Optional[RingContext] = None
        self.ndig = 0

    @staticmethod
    def supports(params, c: CipherText) -> bool:
        return len(c.cs) == 2 and (
            getattr(params, "hybrid_decompose", None) is not None
            or getattr(params, "relin_window", None) == 0)

    def decompose_dual(self, elt: RingElt) -> jnp.ndarray:
        """[ndig, Le, N] digit tensor in the (expanded) tower's dual
        domain; paid once per hoist batch."""
        from ..ops import ntt as nttmod
        from ..utils import metrics
        if self.hybrid:
            self.exp_ring, ddual = self.params.hybrid_decompose_dual(
                self.ring, elt)
            self.ndig = int(ddual.shape[0])
            return ddual
        if self.exp_ring is None:
            expand = getattr(self.params, "keyswitch_expand", None)
            # expand a zero element ONCE to learn the raised tower
            # (the value is discarded; only the ring matters)
            self.exp_ring = (expand(self.ring,
                                    R.zero_like(self.ring, elt))[0]
                             if expand is not None else self.ring)
        digits = gadget_decompose(self.ring, self.exp_ring, elt, 0)
        self.ndig = int(digits.shape[0])
        metrics.count("ntt_limb_transform", self.ndig * self.exp_ring.nlimbs)
        return nttmod.ntt(self.exp_ring.tables, digits)

    def key_stack(self, ksk: KeySwitchKey, extra: int):
        if self.hybrid:
            return _hybrid_key_stack(self.params, ksk, self.exp_ring,
                                     self.ndig, extra)
        masks, maskeds = _downswitch_stack(self.params, ksk, self.exp_ring,
                                           self.ndig)
        if extra:
            shp = masks.shape[:1] + (1,) * extra + masks.shape[1:]
            masks = masks.reshape(shp)
            maskeds = maskeds.reshape(shp)
        return masks, maskeds

    def contract(self, acc_dual: jnp.ndarray) -> RingElt:
        """ModDown the raised accumulator back to the base tower (a
        no-op for the plain RNS gadget)."""
        elt = RingElt(dual=acc_dual)
        if self.hybrid:
            out_ring, e = self.params.hybrid_contract(self.exp_ring, elt)
        else:
            hook = getattr(self.params, "keyswitch_contract", None)
            if hook is None:
                return elt
            out_ring, e = hook(self.exp_ring, elt)
        assert out_ring is self.ring
        return e


def rotate_many(gks: GaloisKeys, c: CipherText, elements) -> dict:
    """Hoisted rotations: {galois_element: rotated ct} for a batch of
    elements, sharing ONE gadget decomposition + digit NTT.

    σ_g commutes with the limb/FBC decomposition (per-coefficient linear
    ops commute with the signed coefficient permutation) and acts on the
    dual domain as the pure permutation ``ntt.galois_dual_perm``; so the
    per-rotation cost drops to a digit gather + key contraction +
    contract — the (ndig·Le)-transform decomposition is paid once
    (HElib/SEAL "hoisting"; beyond the reference). Hybrid-gadget and
    centered-RNS (window=0, incl. ModulusRaised) params take the fast
    path; unsigned windowed digits fall back to rotate()."""
    params = c.params
    if not _HoistGadget.supports(params, c):
        return {g: rotate(gks.for_element(g), c) for g in elements}
    from ..ops import ntt as nttmod
    from ..utils import metrics

    ring = c.ring
    n = ring.n
    gad = _HoistGadget(params, ring)
    ddual = gad.decompose_dual(c.cs[1])                   # [ndig, Le, N]
    c0d = R.ensure_dual(ring, c.cs[0]).dual
    mp3 = gad.exp_ring.mp

    outs = {}
    for g in elements:
        gk = gks.for_element(g)
        metrics.count("rotate")
        metrics.count("keyswitch")
        perm = nttmod.galois_dual_perm_dev(n, g)
        pd = jnp.take(ddual, perm, axis=-1)
        masks, maskeds = gad.key_stack(gk.key, pd.ndim - 3)
        acc2 = _mod_sum(modmath.mul_mod(masks, pd, mp3), mp3)
        acc1 = _mod_sum(modmath.mul_mod(maskeds, pd, mp3), mp3)
        a1 = gad.contract(acc1)
        a2 = gad.contract(acc2)
        c0_rot = RingElt(dual=jnp.take(c0d, perm, axis=-1))
        outs[g] = CipherText(c.params, (R.add(ring, c0_rot, a1), a2), ring,
                             enc=c.enc)
    return outs


def rotate_sum(gks: GaloisKeys, terms) -> CipherText:
    """Σ_g rot_g(term_g) for ``terms`` = [(galois_element | None, ct)]
    (None = identity, no keyswitch). Lazy ModDown: the per-rotation
    keyswitch accumulators are summed in the raised tower and the
    contraction (divide-by-P base conversion) runs ONCE for the whole
    sum instead of once per rotation — the BSGS giant-step loop's
    workhorse (Bossuat et al. eprint 2020/1203 §3.2 "lazy rescaling";
    beyond the reference, which rotates one ciphertext at a time,
    rlwe_she.jl:355-360). One rounding for the batch also means strictly
    less contraction noise than the rotate-then-add schedule. Valid for
    the hybrid and centered-RNS (window=0, incl. ModulusRaised) gadgets;
    other params fall back to rotate()+ct_add."""
    import os
    terms = [(g, t) for (g, t) in terms if t is not None]
    assert terms, "rotate_sum of an empty term list"
    params = terms[0][1].params
    rotated_terms = [(g, t) for (g, t) in terms if g is not None and g != 1]
    # TOYFHE_LAZY_GIANT=0 forces the rotate()+add schedule (A/B tooling)
    if (os.environ.get("TOYFHE_LAZY_GIANT", "1") == "0"
            or not all(_HoistGadget.supports(params, t) for _, t in terms)):
        out = None
        for g, t in terms:
            r = t if (g is None or g == 1) else rotate(gks.for_element(g), t)
            out = r if out is None else ct_add(out, r)
        return out

    from ..ops import ntt as nttmod
    from ..utils import metrics

    # Mirror ct_add's checks up front: the fast path tags the output
    # with the first rotated term's enc, which is only sound when every
    # term shares params and a combine_add-compatible enc (the fallback
    # schedule would raise via ct_add; so must we).
    enc0 = terms[0][1].enc
    for _, t in terms[1:]:
        if t.params is not params:
            raise UsageError(
                "rotate_sum terms carry differing parameters")
        if enc0 is not None and t.enc is not None:
            enc0.combine_add(t.enc)

    c0_ident = None                      # identity terms: plain dual adds
    for g, t in terms:
        if g is None or g == 1:
            c0_ident = t if c0_ident is None else ct_add(c0_ident, t)
    if not rotated_terms:
        return c0_ident

    ring = rotated_terms[0][1].ring
    n = ring.n
    mp = ring.mp
    gad = _HoistGadget(params, ring)
    acc1s = acc2s = None                 # raised-tower accumulators (dual)
    c0s = None                           # base-tower Σ σ_g(c0) (dual)
    for g, t in rotated_terms:
        assert t.ring is ring, "rotate_sum terms must share one tower"
        gk = gks.for_element(g)
        metrics.count("rotate")
        metrics.count("keyswitch")
        ddual = gad.decompose_dual(t.cs[1])
        perm = nttmod.galois_dual_perm_dev(n, g)
        pd = jnp.take(ddual, perm, axis=-1)          # σ_g ∘ decompose
        masks, maskeds = gad.key_stack(gk.key, pd.ndim - 3)
        mp3 = gad.exp_ring.mp
        a2 = _mod_sum(modmath.mul_mod(masks, pd, mp3), mp3)
        a1 = _mod_sum(modmath.mul_mod(maskeds, pd, mp3), mp3)
        acc1s = a1 if acc1s is None else modmath.add_mod(acc1s, a1, mp3)
        acc2s = a2 if acc2s is None else modmath.add_mod(acc2s, a2, mp3)
        c0g = jnp.take(R.ensure_dual(ring, t.cs[0]).dual, perm, axis=-1)
        c0s = c0g if c0s is None else modmath.add_mod(c0s, c0g, mp)

    a1 = gad.contract(acc1s)
    a2 = gad.contract(acc2s)
    t0 = rotated_terms[0][1]
    out = CipherText(params, (R.add(ring, RingElt(dual=c0s), a1), a2),
                     ring, enc=t0.enc)
    return out if c0_ident is None else ct_add(out, c0_ident)


def _hybrid_key_stack(params, ksk: KeySwitchKey, exp_ring: RingContext,
                      ndig: int, extra: int):
    """Stack a hybrid key's components as dual tensors [ndig, Le, N]
    restricted to the expanded tower, with ``extra`` broadcast axes
    inserted for batched ciphertexts."""
    key_ring = ksk.ring
    which = params.hybrid_key_limbs(exp_ring)
    masks, maskeds = [], []
    for comp in ksk.key[:ndig]:
        _, m = R.limb_select(key_ring, R.ensure_dual(key_ring, comp.mask),
                             which)
        _, md = R.limb_select(key_ring, R.ensure_dual(key_ring, comp.masked),
                              which)
        masks.append(m.dual)
        maskeds.append(md.dual)
    masks = jnp.stack(masks, 0)
    maskeds = jnp.stack(maskeds, 0)
    if extra:
        shp = masks.shape[:1] + (1,) * extra + masks.shape[1:]
        masks = masks.reshape(shp)
        maskeds = maskeds.reshape(shp)
    return masks, maskeds


def modswitch(c: CipherText, new_modulus=None) -> CipherText:
    """Generic modulus switch. With no target, behaves like the CKKS
    rescale path; arbitrary-target switching is not implemented — parity
    with the reference, which raises here too (rlwe_she.jl:366-368)."""
    if new_modulus is not None:
        raise NotImplementedError("modswitch to an arbitrary modulus")
    return ct_rescale(c)


# ---------------------------------------------------------------------------
# Modulus switching of whole ciphertexts (crt.jl:234-236, ckksencoding)
# ---------------------------------------------------------------------------

def ct_modswitch_drop(c: CipherText) -> CipherText:
    ring = c.ring
    cs = []
    sub = None
    for x in c.cs:
        sub, y = R.modswitch_drop(ring, x)
        cs.append(y)
    enc = c.enc.drop_limb(ring) if c.enc is not None and hasattr(c.enc, "drop_limb") else c.enc
    return CipherText(c.params, tuple(cs), sub, enc=enc)


def bgv_plain_modulus(params):
    """The plaintext modulus when the (possibly wrapped) base scheme is
    BGV — its divide-and-round steps must keep the error ≡ 0 mod p
    (ring.rescale_adapted); None for every other scheme."""
    base = params
    while isinstance(base, PassthroughParams):
        base = base.params
    return base.plain.p if base.scheme_name() == "BGV" else None


def ct_rescale(c: CipherText) -> CipherText:
    """Modswitch by the last prime: CKKS — exact rescale + scale division
    (ckksencoding.jl:126-130); BGV — p-adapted rounding, the message
    picks up a q_k⁻¹ mod p factor tracked in a BGVTag (leveled BGV,
    beyond the reference)."""
    from ..utils import metrics
    metrics.count("rescale")
    ring = c.ring
    t = bgv_plain_modulus(c.params)
    cs = []
    sub = None
    for x in c.cs:
        sub, y = (R.rescale_adapted(ring, x, t) if t is not None
                  else R.rescale(ring, x))
        cs.append(y)
    if t is not None:
        from .bgv import BGVTag
        enc = (c.enc if c.enc is not None else BGVTag(t)).rescale_by(
            ring.primes[-1])
    else:
        enc = (c.enc.rescale_by(ring.primes[-1])
               if c.enc is not None and hasattr(c.enc, "rescale_by")
               else c.enc)
    import os as _os
    if (_os.environ.get("TOYFHE_DEBUG_SCALES") and enc is not None
            and hasattr(enc, "scale") and 0 < enc.scale < (1 << 40)):
        import math as _m
        print(f"[scales] ct_rescale SMALL post-scale: "
              f"log2={_m.log2(float(enc.scale)):.1f} "
              f"tower {ring.nlimbs}->{ring.nlimbs-1}", flush=True)
    return CipherText(c.params, tuple(cs), sub, enc=enc)


# ---------------------------------------------------------------------------
# Ciphertext batching (leading axes broadcast through the whole engine)
# ---------------------------------------------------------------------------

def ct_stack(cts) -> CipherText:
    """Stack ciphertexts with identical params/ring/encoding into one
    batched ciphertext (leading batch axis). Every engine op — add, mul,
    keyswitch, rotate, rescale — broadcasts over leading axes."""
    c0 = cts[0]
    for c in cts[1:]:
        if c.params is not c0.params or c.ring is not c0.ring:
            raise UsageError("ct_stack requires identical params and tower")
        if len(c.cs) != len(c0.cs):
            raise UsageError("ct_stack requires equal component counts")
    cs = []
    for i in range(len(c0.cs)):
        duals = [R.ensure_dual(c0.ring, c.cs[i]).dual for c in cts]
        cs.append(RingElt(dual=jnp.stack(duals, axis=0)))
    return CipherText(c0.params, tuple(cs), c0.ring, enc=c0.enc)


def ct_index(c: CipherText, i: int) -> CipherText:
    """Extract element i of a batched ciphertext."""
    cs = []
    for x in c.cs:
        cs.append(RingElt(
            primal=None if x.primal is None else x.primal[i],
            dual=None if x.dual is None else x.dual[i]))
    return CipherText(c.params, tuple(cs), c.ring, enc=c.enc)
