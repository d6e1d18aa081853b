"""Measure the StableHLO module sizes of the production-N bootstrap
replay — whole-program vs per-phase — WITHOUT compiling (lowering is
local; only the compile POST hits the remote-compile upload limit that
413'd the N=2^13 run).

Usage: python -u tools/probe_boot_module_size.py [logN] [depth]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 46

    import jax
    from fractions import Fraction
    import toyfhe_tpu as F
    from toyfhe_tpu.core import bootstrap as B
    from toyfhe_tpu.core import ckks_encoding as CE

    cpu = jax.devices("cpu")[0]
    n = 1 << logn
    L, dnum = depth, max(1, (depth + 2) // 5)
    k = -(-(depth + 2) // dnum) + 1

    t0 = time.time()
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    with jax.default_device(cpu):
        ring = F.make_rns_ring(n, (29, 29) + (26,) * L + (29,) * k)
        params = F.HybridRaised(
            F.CKKSParams(ring, 0, 3.2, secret="sparse", hamming_weight=8),
            dnum=dnum, num_special=k)
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        kp = F.keygen(params, ks[0])
        ctx = B.setup_bootstrap(ks[1], kp.priv, K=6.0, deg=59, radix=16,
                                arcsin=True, scale_limbs=2)
        rng = np.random.default_rng(3)
        vals = (rng.uniform(-1, 1, n // 2)) * 0.7
        c = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                           Fraction(2) ** 52), ks[2])
        while c.ring.nlimbs > 2:
            c = F.ct_modswitch_drop(c)
    print(f"setup (cpu): {time.time()-t0:.0f}s", flush=True)

    host = lambda t: jax.tree_util.tree_map(np.asarray, t)
    ctx_h, c_h = host(ctx), host(c)

    t0 = time.time()
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    with jax.default_device(cpu):
        i1, i2, i3, (out1, out2) = B.trace_plain_cache_phased(ctx_h, c_h)
    os.environ.pop("TOYFHE_NTT_IMPL", None)
    print(f"phase trace (cpu): {time.time()-t0:.0f}s  items="
          f"{len(i1)}/{len(i2)}/{len(i3)}", flush=True)

    # lower FOR THE TPU backend (local lowering, no remote compile)
    def size(fn, *args):
        t1 = time.time()
        low = jax.jit(fn).lower(*args)
        txt = low.compiler_ir("stablehlo")
        import io
        try:
            from jax._src.interpreters import mlir as _mlir
            data = _mlir.module_to_bytecode(txt)
            nb = len(data)
        except Exception:
            nb = len(str(txt))
        print(f"  lowered in {time.time()-t1:.0f}s: {nb/1e6:.1f} MB",
              flush=True)
        return nb

    factor, pin = B._phase3_statics(ctx_h, c_h)

    def rp(items_, fn, *args):
        rc = CE.PlainCache()
        rc.items = list(items_)
        with CE.plaintext_cache(rc, "replay"):
            return fn(*args)

    print("phase1:", flush=True)
    size(lambda a, b, it: rp(it, B.bootstrap_phase1, a, b), ctx_h, c_h, i1)
    print("phase2:", flush=True)
    size(lambda a, l, h2, it: rp(it, B.bootstrap_phase2, a, l, h2),
         ctx_h, *out1, i2)
    print("phase3:", flush=True)
    size(lambda a, e, it: rp(it, lambda x, y: B.bootstrap_phase3(
        x, y, factor, pin), a, e), ctx_h, out2, i3)
    print("full:", flush=True)
    allitems = list(i1) + list(i2) + list(i3)
    size(lambda a, b, it: rp(it, B.bootstrap, a, b), ctx_h, c_h, allitems)


if __name__ == "__main__":
    main()
