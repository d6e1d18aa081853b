"""CKKS tower planning.

Choosing an RNS tower by hand is error-prone (this round hit both
failure modes: a bottom tower too small for the final scale², and a
scale mismatched to the rescale primes so levels drifted). This utility
encodes the constraints:

  * scale ≈ rescale-prime size keeps the scale stable across levels;
  * after consuming ``depth`` rescales, the surviving bottom tower must
    cover scale² · 2^value_bits (the last multiply is not rescaled
    before decryption);
  * primes < 2^30 enable the Harvey-lazy and MXU kernel paths;
  * one extra limb is reserved as the SEAL-style special prime.
"""

from __future__ import annotations

import math
from typing import Tuple

from .ring import RingContext, make_rns_ring


def plan_ckks_tower(n: int, depth: int, scale_bits: int = 28,
                    value_bits: int = 8,
                    special: bool = True) -> Tuple[Tuple[int, ...], int]:
    """Returns (limb_bits, scale_log2) for a CKKS circuit of ``depth``
    rescales with slot magnitudes up to 2^value_bits.

    limb sizes equal scale_bits (< 30 recommended); bottom limbs are
    added until they cover the final scale² · value range; the last limb
    is the special prime when ``special``.
    """
    if not (20 <= scale_bits <= 29):
        raise ValueError("scale_bits should be in [20, 29] "
                         "(primes < 2^30 keep the fast kernel paths)")
    final_bits = 2 * scale_bits + value_bits + 2     # scale² · |v| · margin
    bottom = max(2, -(-final_bits // scale_bits))
    data_limbs = bottom + depth
    limbs = (scale_bits,) * (data_limbs + (1 if special else 0))
    return limbs, scale_bits


def plan_ckks_ring(n: int, depth: int, scale_bits: int = 28,
                   value_bits: int = 8) -> Tuple[RingContext, int]:
    """Convenience: build the ring for :func:`plan_ckks_tower`. Checks
    the HomomorphicEncryption.org budget when a standard N is used."""
    from . import cryptparams

    limbs, s = plan_ckks_tower(n, depth, scale_bits, value_bits)
    total = sum(limbs)
    try:
        max_n = cryptparams.std_ring_dim(
            cryptparams.HEStd_error, cryptparams.HEStd_128_classic, total)
        if max_n > n:
            import warnings
            warnings.warn(
                f"tower of {total} bits wants N ≥ {max_n} for 128-bit "
                f"classical security (got N={n})")
    except ValueError:
        pass
    return make_rns_ring(n, limbs), s
