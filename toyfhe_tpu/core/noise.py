"""Noise instrumentation across all three schemes.

Generalizes the reference's single metric (BFV invariant noise budget,
bfv.jl:136-164 — see core/bfv.py) to BGV and CKKS, per SURVEY §5.
All meters require the secret key and run on the host debug path.
"""

from __future__ import annotations

import math

import numpy as np

from ..utils import numtheory as nt
from . import ring as R
from .rlwe import CipherText, KeyPair, decrypt_raw, decrypt


def bgv_noise_budget(key, c: CipherText) -> float:
    """Bits of headroom before BGV decryption fails: log2(q/2) minus the
    log-magnitude of the centered payload m + p·e."""
    priv = key.priv if isinstance(key, KeyPair) else key
    b = decrypt_raw(priv, c)
    ring = c.ring
    b = R.ensure_primal(ring, b)
    arr = np.asarray(b.primal)
    q = ring.modulus
    nat = ring.native()
    if nat is not None:
        vals = np.abs(nat.decode_centered_double(arr))
        worst = float(max(vals.max(), 1.0))
        return math.log2(q / 2) - math.log2(worst)
    xs = ring.to_bigint(arr)
    worst = max(max(abs(nt.centered(x, q)) for x in xs), 1)
    return math.log2(q / 2) - math.log2(worst)


def ckks_precision(key, c: CipherText, expected) -> float:
    """Measured CKKS precision in bits: −log2 of the max absolute slot
    error against the expected values (the CKKS half of the noise story —
    scale bookkeeping gives the *budget*, this measures the *actual*)."""
    got = decrypt(key, c)
    err = float(np.abs(np.asarray(got) - np.asarray(expected)).max())
    return -math.log2(max(err, 1e-300))


def ckks_scale_bits(c: CipherText) -> float:
    """Current scale in bits (type-level scale algebra made inspectable)."""
    return math.log2(float(c.enc.scale))
