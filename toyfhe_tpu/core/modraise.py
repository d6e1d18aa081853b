"""SEAL v3.3 "special prime" key switching —
``/root/reference/src/modulusraising.jl``.

The last prime of the tower is reserved for keys: ciphertexts live one
limb short, and key switching multiplies the ciphertext into the special
prime's basis, switches there, then rescales the noise back down by the
special prime — shrinking key-switch noise by ~ps without a fine
relinearization radix.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import ring as R
from . import rlwe
from .ring import RingContext, RingElt
from .rlwe import CipherText, PassthroughParams, PubKey


class ModulusRaised(PassthroughParams):
    """Scheme modifier: treat the last CRT prime as the special prime
    (modulusraising.jl:12-21)."""

    @property
    def ring_cipher(self) -> RingContext:
        # ciphertexts live in the sub-tower without the special prime
        return self.params.ring_cipher.drop_last()

    @property
    def ring_key(self) -> RingContext:
        return self.params.ring_cipher

    @property
    def special_prime(self) -> int:
        return self.params.ring_cipher.primes[-1]

    # encrypt at the full tower under the parent params, then drop the
    # special limb (modulusraising.jl:23-26)
    def encrypt_zero(self, pub: PubKey, rng) -> CipherText:
        full = self.params.ring_cipher
        c = rlwe._encrypt_zero_at(self, full, pub.key, rng)
        cs = []
        sub = None
        for x in c.cs:
            sub, y = R.modswitch_drop(full, x)
            cs.append(y)
        return CipherText(self, tuple(cs), sub)

    # key-switch keys encrypt ps·old (modulusraising.jl:28-32)
    def lift_old_key(self, old: RingElt) -> RingElt:
        full = self.params.ring_cipher
        return R.scalar_mul(full, self.special_prime, old)

    # ciphertext digit expanded into the special prime's basis by
    # multiplying with ps and adjoining a zero special limb
    # (CRTExpand, modulusraising.jl:35-41)
    def keyswitch_expand(self, ring: RingContext, c: RingElt):
        full = self.params.ring_cipher
        expanded_ring = full.select(list(range(ring.nlimbs)) + [full.nlimbs - 1])
        c = R.ensure_primal(ring, c)
        scaled = R.scalar_mul(ring, self.special_prime, c)
        zerolimb = jnp.zeros(c.primal.shape[:-2] + (1, ring.n), dtype=jnp.uint32)
        return expanded_ring, RingElt(
            primal=jnp.concatenate([scaled.primal, zerolimb], axis=-2))

    # rescale by the special prime (modulusraising.jl:42 → crt.jl:215-220);
    # BGV needs the p-adapted correction so the low plaintext digits
    # survive the division (no net message factor — P fully cancels)
    def keyswitch_contract(self, ring: RingContext, c: RingElt):
        t = rlwe.bgv_plain_modulus(self)
        if t is not None:
            return R.rescale_adapted(ring, c, t)
        if c.dual is not None and c.primal is None:
            return R.rescale_dual(ring, c)     # fused, bit-identical
        return R.rescale(ring, c)
