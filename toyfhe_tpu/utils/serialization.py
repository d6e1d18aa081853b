"""Key and ciphertext serialization.

The reference has no key/ciphertext persistence at all (SURVEY §5:
checkpointing exists only as BSON'd Flux weights in the MNIST example).
Keys for MNIST-sized configs are large — nlimbs × 2 ring elements per
gadget digit (rlwe_she.jl:287-297) — so this is a first-class feature
here: dense-tensor ring data serializes to a single compressed .npz with
a JSON header describing the rings and scheme metadata, enabling
checkpoint/resume of long encrypted computations and key distribution to
other hosts.
"""

from __future__ import annotations

import json
from fractions import Fraction
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core import ring as ringops
from ..core.ring import RingContext, RingElt
from ..core import rlwe
from ..core.ckks_encoding import CKKSTag


def _ring_meta(ring: RingContext) -> dict:
    return {"n": ring.n, "primes": [str(p) for p in ring.primes],
            "psis": [str(p) for p in ring.psis]}


def ring_from_meta(meta: dict) -> RingContext:
    return RingContext(meta["n"], [int(p) for p in meta["primes"]],
                       [int(p) for p in meta["psis"]])


def _put_elt(arrays: dict, prefix: str, x: RingElt) -> dict:
    info = {}
    if x.primal is not None:
        arrays[prefix + ".primal"] = np.asarray(x.primal)
        info["primal"] = True
    if x.dual is not None:
        arrays[prefix + ".dual"] = np.asarray(x.dual)
        info["dual"] = True
    return info


def _get_elt(arrays, prefix: str, info: dict) -> RingElt:
    return RingElt(
        primal=jnp.asarray(arrays[prefix + ".primal"]) if info.get("primal") else None,
        dual=jnp.asarray(arrays[prefix + ".dual"]) if info.get("dual") else None)


def save_ciphertext(path: str, c: rlwe.CipherText) -> None:
    arrays: Dict[str, np.ndarray] = {}
    comps = [_put_elt(arrays, f"c{i}", x) for i, x in enumerate(c.cs)]
    header = {"kind": "ciphertext", "ring": _ring_meta(c.ring),
              "ncomp": len(c.cs), "comps": comps}
    if isinstance(c.enc, CKKSTag):
        header["scale"] = [str(c.enc.scale.numerator), str(c.enc.scale.denominator)]
    arrays["header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_ciphertext(path: str, params) -> rlwe.CipherText:
    z = np.load(path)
    header = json.loads(bytes(z["header"]).decode())
    assert header["kind"] == "ciphertext"
    ring = _resolve_ring(params, header["ring"])
    cs = tuple(_get_elt(z, f"c{i}", info) for i, info in enumerate(header["comps"]))
    enc = None
    if "scale" in header:
        enc = CKKSTag(Fraction(int(header["scale"][0]), int(header["scale"][1])))
    return rlwe.CipherText(params, cs, ring, enc=enc)


def save_keyswitch_key(path: str, ksk: rlwe.KeySwitchKey) -> None:
    arrays: Dict[str, np.ndarray] = {}
    comps = []
    for i, kc in enumerate(ksk.key):
        comps.append({
            "mask": _put_elt(arrays, f"k{i}.mask", kc.mask),
            "masked": _put_elt(arrays, f"k{i}.masked", kc.masked),
        })
    header = {"kind": "keyswitch_key", "ring": _ring_meta(ksk.ring),
              "ndig": len(ksk.key), "comps": comps}
    arrays["header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_keyswitch_key(path: str, params) -> rlwe.KeySwitchKey:
    z = np.load(path)
    header = json.loads(bytes(z["header"]).decode())
    assert header["kind"] == "keyswitch_key"
    ring = _resolve_ring(params, header["ring"])
    comps = [rlwe.KeyComponent(
        mask=_get_elt(z, f"k{i}.mask", info["mask"]),
        masked=_get_elt(z, f"k{i}.masked", info["masked"]))
        for i, info in enumerate(header["comps"])]
    return rlwe.KeySwitchKey(params, comps, ring)


def save_keypair(path: str, kp: rlwe.KeyPair) -> None:
    arrays: Dict[str, np.ndarray] = {}
    header = {
        "kind": "keypair",
        "ring": _ring_meta(kp.priv.params.ring_key),
        "secret": _put_elt(arrays, "secret", kp.priv.secret),
        "mask": _put_elt(arrays, "pub.mask", kp.pub.key.mask),
        "masked": _put_elt(arrays, "pub.masked", kp.pub.key.masked),
    }
    arrays["header"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_keypair(path: str, params) -> rlwe.KeyPair:
    z = np.load(path)
    header = json.loads(bytes(z["header"]).decode())
    assert header["kind"] == "keypair"
    priv = rlwe.PrivKey(params, _get_elt(z, "secret", header["secret"]))
    pub = rlwe.PubKey(params, rlwe.KeyComponent(
        mask=_get_elt(z, "pub.mask", header["mask"]),
        masked=_get_elt(z, "pub.masked", header["masked"])))
    return rlwe.KeyPair(priv, pub)


def _resolve_ring(params, meta: dict) -> RingContext:
    """Reuse the params' ring-context chain when the serialized tower
    matches (keeps cached tables + identity-based chains intact)."""
    primes = [int(p) for p in meta["primes"]]
    ring = params.ring_key
    while ring.nlimbs > len(primes):
        ring = ring.drop_last()
    if ring.primes == primes and ring.n == meta["n"]:
        return ring
    return ring_from_meta(meta)


def save_eval_mult_key(path: str, ek) -> None:
    save_keyswitch_key(path, ek.key)


def load_eval_mult_key(path: str, params):
    from ..core.rlwe import EvalMultKey
    return EvalMultKey(load_keyswitch_key(path, params))


def save_galois_key(path: str, gk) -> None:
    import json as _json
    arrays: Dict[str, np.ndarray] = {}
    comps = []
    for i, kc in enumerate(gk.key.key):
        comps.append({"mask": _put_elt(arrays, f"k{i}.mask", kc.mask),
                      "masked": _put_elt(arrays, f"k{i}.masked", kc.masked)})
    header = {"kind": "galois_key", "galois_element": gk.galois_element,
              "ring": _ring_meta(gk.key.ring), "comps": comps}
    arrays["header"] = np.frombuffer(_json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_galois_key(path: str, params):
    import json as _json

    from ..core.rlwe import GaloisKey, KeyComponent, KeySwitchKey
    z = np.load(path)
    header = _json.loads(bytes(z["header"]).decode())
    assert header["kind"] == "galois_key"
    ring = _resolve_ring(params, header["ring"])
    comps = [KeyComponent(mask=_get_elt(z, f"k{i}.mask", info["mask"]),
                          masked=_get_elt(z, f"k{i}.masked", info["masked"]))
             for i, info in enumerate(header["comps"])]
    return GaloisKey(header["galois_element"], KeySwitchKey(params, comps, ring))
