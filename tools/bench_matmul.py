"""Rotation-matmul schedule A/B on the real TPU chip: the reference's
iterated d-rotation loop (infer.jl:141-150) vs the hoisted BSGS schedule
(models/mnist.py::encrypted_matmul_bsgs — rotate_many baby hoisting +
rotate_sum lazy ModDown, ~2√d keyswitches instead of d−1).

Usage: python -u tools/bench_matmul.py [logN] [d] [gadget]
       (defaults: logN=13, d=64, gadget=modraise — the MNIST dense-layer
       shape; gadget=hybrid uses the dnum-grouped gadget)

Methodology: CPU eager setup, both schedules jitted into one XLA program
each with keys as pytree arguments, floor-corrected repeated-run timing
(see tools/bench_bootstrap.py — chained slopes are wrong here because
compile time scales with chain length).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    gadget = sys.argv[3] if len(sys.argv) > 3 else "modraise"

    import jax
    from toyfhe_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()   # persistent XLA cache: warm 2nd-session compiles
    import toyfhe_tpu as F
    from toyfhe_tpu.models import mnist as M
    from toyfhe_tpu.core import rlwe
    from fractions import Fraction

    cpu = jax.devices("cpu")[0]
    n = 1 << logn
    assert (n // 2) % d == 0, f"d={d} must divide the slot count {n // 2}"
    inner = (n // 2) // d

    cfg = M.MNISTConfig(ring_logn=logn, gadget=gadget)

    t0 = time.time()
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    with jax.default_device(cpu):
        setup = M.fhe_setup(cfg, jax.random.PRNGKey(5))
        # override geometry: bench uses (d, inner) directly
        rng = np.random.default_rng(3)
        W = rng.uniform(-1, 1, (d, d))
        xfeat = rng.uniform(-1, 1, d)
        slots = np.repeat(xfeat, inner).astype(complex)
        c = F.encrypt(setup.kp,
                      F.make_plaintext(setup.params.ring_cipher, slots,
                                       setup.scale),
                      jax.random.PRNGKey(7))
        from toyfhe_tpu.core import bootstrap as B
        bs, gs = B.bsgs_split(d)
        steps = sorted({b * inner for b in range(1, bs)}
                       | {g * bs * inner for g in range(1, gs)})
        gks = F.keygen_galois_set(jax.random.PRNGKey(9), setup.kp.priv,
                                  steps)
        # single step-`inner` key for the iterated loop
        gk1 = F.keygen_galois(jax.random.PRNGKey(11), setup.kp.priv,
                              steps=inner)
    print(f"setup (cpu): {time.time()-t0:.0f}s  N={n} d={d} inner={inner} "
          f"gadget={gadget} bs={bs} gs={gs} keys={len(gks.keys)}",
          flush=True)
    os.environ.pop("TOYFHE_NTT_IMPL", None)

    host = lambda t: jax.tree_util.tree_map(np.asarray, t)
    c_h, gks_h, gk1_h = host(c), host(gks), host(gk1)
    # pin the key material on the device ONCE — host numpy leaves would
    # re-cross the tunnel on every call (the BSGS set is ~bs+gs keys,
    # tens of MB; serving holds keys resident)
    gks_h = jax.device_put(gks_h)
    gk1_h = jax.device_put(gk1_h)

    inner_rep = inner
    Wd = {k: np.repeat(np.diag(np.roll(W, k, axis=1)), inner_rep)
          for k in range(d)}

    def fn_iter(c_, gk_):
        from toyfhe_tpu.core import ckks_encoding as CE
        res = CE.mul_plain_vector(c_, Wd[0])
        rot = c_
        for k in range(1, d):
            rot = rlwe.rotate(gk_, rot)
            res = rlwe.ct_add(res, CE.mul_plain_vector(rot, Wd[k]))
        return res

    def fn_bsgs(c_, gks_):
        # the exact production schedule (models/mnist.py), inner overridden
        terms = M._bsgs_matmul_terms(setup, gks_, W, c_, inner=inner_rep)
        return rlwe.rotate_sum(gks_, terms)

    results = {}
    outs = {}
    for name, fn, keyarg in (("iterated", fn_iter, gk1_h),
                             ("bsgs", fn_bsgs, gks_h)):
        t0 = time.time()
        compiled = jax.jit(fn).lower(c_h, keyarg).compile()
        print(f"{name} compile: {time.time()-t0:.0f}s", flush=True)
        out = compiled(c_h, keyarg)
        arr = out.cs[0].dual if out.cs[0].dual is not None else out.cs[0].primal
        np.asarray(arr)
        outs[name] = out
        import jax as _jax
        pick = ((lambda x: x.cs[0].dual) if c_h.cs[0].dual is not None
                else (lambda x: x.cs[0].primal))
        floor_fn = _jax.jit(lambda x: pick(x) + 1).lower(c_h).compile()
        np.asarray(floor_fn(c_h))
        floors, times = [], []
        for _ in range(9):
            t0 = time.time()
            np.asarray(floor_fn(c_h))
            floors.append(time.time() - t0)
            t0 = time.time()
            o = compiled(c_h, keyarg)
            np.asarray(o.cs[0].dual if o.cs[0].dual is not None
                       else o.cs[0].primal)
            times.append(time.time() - t0)
        wall = min(times) - min(floors)
        results[name] = wall
        print(f"{name}: {wall*1e3:.2f} ms/matmul "
              f"(min run={min(times):.4f}s floor={min(floors):.4f}s)",
              flush=True)

    # correctness on CPU
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    expect = np.repeat(W @ xfeat, inner_rep)
    errs = {}
    with jax.default_device(cpu):
        for name, out in outs.items():
            got = F.decrypt(setup.kp, host(out)).real
            errs[name] = float(np.max(np.abs(got - expect)))
    print(json.dumps({
        "metric": f"rot_matmul_ms_n2^{logn}_d{d}_{gadget}",
        "value": round(results["bsgs"] * 1e3, 3), "unit": "ms/matmul",
        "iterated_ms": round(results["iterated"] * 1e3, 3),
        "speedup": round(results["iterated"] / max(results["bsgs"], 1e-9), 2),
        "max_err_bsgs": errs["bsgs"], "max_err_iterated": errs["iterated"],
        "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
