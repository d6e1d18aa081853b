"""Ring element sampling with explicit, threaded PRNG keys.

Replaces the reference's ``RingSampler`` + Distributions.jl draws from
``Random.GLOBAL_RNG`` (``/root/reference/src/poly.jl:7-23``) with
``jax.random`` so every keygen/encrypt is reproducible from a seed —
fixing the reference's reproducibility gap (SURVEY §4).

Distributions:
  * uniform over the full tower — independent uniform residue per limb
    (DiscreteUniform path, crt.jl:146-148);
  * discrete gaussian (rounded normal, σ ≈ 3.2 / 8/√(2π)) — one integer
    per coefficient, embedded into every limb (poly.jl:18-23 semantics);
  * shifted discrete gaussian p·𝒩 for BGV (bgv.jl:27-33);
  * zero for InsecureDebug (insecuredebug.jl:9-14).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from . import modmath


def uniform(key, mp: modmath.MontParams, n: int, batch: Tuple[int, ...] = ()):
    """Uniform residues uint32[batch..., L, N] — one independent draw per limb."""
    L = mp.nlimbs
    keys = jax.random.split(key, L)
    cols = []
    maxvals = mp.p.ravel()
    for l in range(L):
        cols.append(jax.random.randint(
            keys[l], batch + (1, n), 0, int(maxvals[l]), dtype=jnp.int32))
    return jnp.concatenate(cols, axis=-2).astype(jnp.uint32)


def discrete_gaussian(key, mp: modmath.MontParams, n: int, sigma: float,
                      batch: Tuple[int, ...] = (), shift: int = 1):
    """Rounded discrete gaussian, optionally scaled by ``shift`` (BGV p·𝒩).

    Returns the same signed integer reduced into every limb of the tower.
    """
    g = jax.random.normal(key, batch + (1, n), dtype=jnp.float32) * sigma
    ints = jnp.round(g).astype(jnp.int32) * jnp.int32(shift)
    return modmath.from_signed(jnp.broadcast_to(ints, batch + (mp.nlimbs, n)), mp)


def zero(mp: modmath.MontParams, n: int, batch: Tuple[int, ...] = ()):
    return jnp.zeros(batch + (mp.nlimbs, n), dtype=jnp.uint32)


def sparse_ternary(key, mp: modmath.MontParams, n: int, h: int,
                   batch: Tuple[int, ...] = ()):
    """Sparse ternary secret: exactly ``h`` nonzero ±1 coefficients at
    uniform positions (the HES sparse-secret distribution used for CKKS
    bootstrapping — bounds the ModRaise overflow ‖I‖∞ ≤ (1+h)/2+1)."""
    import numpy as np

    nb = int(np.prod(batch)) if batch else 1
    keys = jax.random.split(key, 2 * nb)
    outs = []
    for i in range(nb):
        perm = jax.random.permutation(keys[2 * i], n)
        signs = jax.random.randint(keys[2 * i + 1], (n,), 0, 2,
                                   dtype=jnp.int32) * 2 - 1
        outs.append(jnp.where(perm < h, signs, 0))
    ints = jnp.stack(outs).reshape(batch + (1, n))
    return modmath.from_signed(
        jnp.broadcast_to(ints, batch + (mp.nlimbs, n)), mp)
