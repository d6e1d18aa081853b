"""Production-N CKKS bootstrap on the real TPU chip.

Usage:  python -u tools/bench_bootstrap.py [logN] [radix] [h] [dnum]
                                           [batch] [kmargin] [sl]
        (defaults: logN=11, radix=16, h=8, dnum=0, batch=1, kmargin=1.5,
        sl=1)
        dnum=0 → ModulusRaised per-limb gadget, one special prime;
        dnum>0 → HybridRaised dnum-grouped gadget (core/hybrid.py) with
        ceil(L/dnum)+1 raising primes.
        batch>1 → refresh `batch` ciphertexts per program
        (bootstrap_batched); reports ms **per refresh**.
        batch=-1 → lazy-giant A/B: compile the refresh twice (with and
        without rotate_sum's lazy-ModDown giant steps) and report the
        same-session ratio.
        sl=2 → composite scaling: 2×29-bit base (q₀≈2^59), 26-bit level
        pairs, scale 2^52 — the PRECISION config for N ≥ 2^11 where the
        single-prime scale noise floor breaks the refresh.

Pipeline: keygen/encode/setup run EAGERLY ON CPU (eager dispatch over
the TPU tunnel is pathological — docs/performance.md), all device state
is pulled back to numpy, then jax.jit(bootstrap-chain) compiles the
ENTIRE refresh (ModRaise → factored CoeffToSlot → batched sine EvalMod
with arcsine correction → factored SlotToCoeff) into ONE XLA program
for the TPU. Timing is the chained-jit slope (bootstrap → re-exhaust →
bootstrap) so dispatch/transfer constants cancel.

The parameter sets here are performance/correctness demos in the spirit
of the reference's toy rings — the deep tower at these N is far below
128-bit security; production deployments would move to N ≥ 2^15 with
the same code paths.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    radix = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    dnum = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    ab = batch == -1
    nb = max(batch, 1)
    kmargin = float(sys.argv[6]) if len(sys.argv) > 6 else 1.5
    sl = int(sys.argv[7]) if len(sys.argv) > 7 else 1

    import jax
    from toyfhe_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()   # persistent XLA cache: warm 2nd-session compiles
    import jax.numpy as jnp
    import toyfhe_tpu as F
    from toyfhe_tpu.core import bootstrap as B
    from fractions import Fraction

    n = 1 << logn
    d = n // 2
    # margin above the mean |I| bound: tail events scale with N (more
    # coefficient draws), so production N needs more headroom (argv[6])
    K = (1 + h) / 2 + kmargin
    deg = int(2 * np.pi * K) + 22
    L = 24 if sl == 1 else 46                 # level limbs (sl per level)
    cpu = jax.devices("cpu")[0]

    t0 = time.time()
    # Eager setup runs on host CPU while the default backend is TPU —
    # force the radix-2 path so the MXU Pallas kernel (TPU-only) is not
    # selected for CPU-resident arrays. Restored before the TPU jit.
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    with jax.default_device(cpu):
        # 29-bit limb requests: a "30-bit" request yields 31-bit primes,
        # which fail the 2^30 MXU/lazy gate and silently demote every
        # transform in the refresh to radix-2 (docs/performance.md)
        if sl == 2:
            # composite scaling: 2×29-bit base, BALANCED 26-bit level
            # pairs (B.make_boot_ring — the N=2^13 root-cause fix: the
            # upward prime walk's pair drift collapses the working scale
            # through the unstable scale²/pair equilibrium)
            scale = Fraction(2) ** 52
            base_limbs = 2
        else:
            tower = (29,) * (L + 1)
            scale = Fraction(2) ** 27
            base_limbs = 1
        lct = (2 + L) if sl == 2 else L
        if dnum:
            alpha = -(-lct // dnum)
            k = alpha + 1                 # P > alpha * Q_group headroom
            if sl == 2:
                ring = B.make_boot_ring(n, L=L, num_special=k)
            else:
                ring = F.make_rns_ring(n, tower + (29,) * k)
            params = F.HybridRaised(
                F.CKKSParams(ring, 0, 3.2, secret="sparse",
                             hamming_weight=h), dnum, k)
        else:
            if sl == 2:
                ring = B.make_boot_ring(n, L=L, num_special=1)
            else:
                ring = F.make_rns_ring(n, tower)
            params = F.ModulusRaised(
                F.CKKSParams(ring, 0, 3.2, secret="sparse",
                             hamming_weight=h))
        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        kp = F.keygen(params, ks[0])
        ctx = B.setup_bootstrap(ks[1], kp.priv, K=K, deg=deg, radix=radix,
                                arcsin=True, scale_limbs=sl)
        rng = np.random.default_rng(3)
        all_vals, cts = [], []
        for i in range(max(batch, 1)):
            v = (rng.uniform(-1, 1, d) + 1j * rng.uniform(-1, 1, d)) * 0.7
            ci = F.encrypt(kp, F.make_plaintext(params.ring_cipher, v,
                                                scale),
                           jax.random.fold_in(ks[2], i))
            while ci.ring.nlimbs > base_limbs:
                ci = F.ct_modswitch_drop(ci)
            all_vals.append(v)
            cts.append(ci)
        vals, c = all_vals[0], cts[0]
    print(f"setup (cpu): {time.time()-t0:.0f}s  N={n} d={d} L={L} "
          f"radix={radix} h={h} K={K} deg={deg} "
          f"rotkeys={len(ctx.gks.keys)}", flush=True)

    os.environ.pop("TOYFHE_NTT_IMPL", None)   # TPU path: MXU kernels on
    # decouple from CPU commitment so jit dispatches to the default
    # (TPU) backend and transfers inputs once
    host = lambda t: jax.tree_util.tree_map(np.asarray, t)
    ctx_h, c_h = host(ctx), host(c)
    if batch > 1:
        from toyfhe_tpu.core import rlwe
        drive_h = host(rlwe.ct_stack(cts))
    else:
        drive_h = c_h

    def exhaust(ct):
        from toyfhe_tpu.core import rlwe
        while ct.ring.nlimbs > 1:
            ct = rlwe.ct_modswitch_drop(ct)
        return ct

    # jit with the encoded diagonals as ARGUMENTS (device buffers) — at
    # production N the inlined constants alone are hundreds of MB and
    # exceed the remote-compile upload limit (HTTP 413). The record pass
    # is one abstract CPU trace (host encodes run concretely; ciphertext
    # math stays abstract) — production-N feasible, unlike the eager
    # refresh record (1051 s at N=2^10 L=24).
    phased = os.environ.get("TOYFHE_BOOT_PHASED", "0") == "1"
    t0 = time.time()
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    with jax.default_device(cpu):
        if phased:
            i1, i2, i3, _ = B.trace_plain_cache_phased(ctx_h, c_h)
            items = (i1, i2, i3)
        else:
            items = B.trace_plain_cache(ctx_h, c_h)
    os.environ.pop("TOYFHE_NTT_IMPL", None)
    items = jax.tree_util.tree_map(np.asarray, items)
    leaves = jax.tree_util.tree_leaves(items)
    mb = sum(x.nbytes for x in leaves) / 1e6
    print(f"record (cpu trace{' phased' if phased else ''}): "
          f"{time.time()-t0:.0f}s  ({len(leaves)} diagonal tensors, "
          f"{mb:.0f} MB as args)", flush=True)
    # pin the key material + transform diagonals on the device ONCE —
    # host numpy jit arguments re-cross the tunnel on EVERY call (tens
    # of MB/refresh measured as ~1s of fake "bootstrap wall")
    ctx_h = jax.device_put(ctx_h)
    items = jax.device_put(items)
    # Timing: repeated single-refresh runs minus the measured dispatch/
    # transfer floor. (The chained-slope methodology is wrong here —
    # XLA compile time scales with the chain length, and one bootstrap
    # graph already takes ~25 min to compile at L=24.) The floor is a
    # trivial jitted op on the same ciphertext pytree, so the tunnel's
    # dispatch + sync cost cancels to first order; bootstrap wall is
    # ~100× the floor, so the correction is small anyway.
    import jax as _jax
    pick = ((lambda c_: c_.cs[0].dual) if drive_h.cs[0].dual is not None
            else (lambda c_: c_.cs[0].primal))
    floor_fn = _jax.jit(lambda c_: pick(c_) + 1).lower(drive_h).compile()

    def measure(lazy=True):
        os.environ["TOYFHE_LAZY_GIANT"] = "1" if lazy else "0"
        try:
            if phased:
                # three smaller programs: the whole-refresh module at
                # N=2^13 passes the upload limit (row-view tables) but
                # can OOM the remote compile helper. batch>1 vmaps each
                # phase (jit_bootstrap_replay_phased_batched) — the
                # production-N amortized-refresh path (round-5).
                if batch > 1:
                    prun = B.jit_bootstrap_replay_phased_batched(
                        ctx_h, c_h)
                else:
                    prun = B.jit_bootstrap_replay_phased(ctx_h, drive_h)
                t0 = time.time()
                compiled = lambda a, b, it: prun(a, b, it)
                print(f"phased compile path (lazy={lazy}, batch={nb}): "
                      f"compiles on first call", flush=True)
            else:
                fn = (B.jit_bootstrap_batched_replay() if batch > 1
                      else B.jit_bootstrap_replay())
                t0 = time.time()
                lowered = fn.lower(ctx_h, drive_h, items)
                print(f"trace(lazy={lazy}): {time.time()-t0:.0f}s",
                      flush=True)
                t0 = time.time()
                compiled = lowered.compile()
                print(f"compile(lazy={lazy}): {time.time()-t0:.0f}s",
                      flush=True)
            t0 = time.time()
            out = compiled(ctx_h, drive_h, items)
            np.asarray(out.cs[0].dual if out.cs[0].dual is not None
                       else out.cs[0].primal)
            print(f"run1 (incl transfer): {time.time()-t0:.1f}s",
                  flush=True)
            np.asarray(floor_fn(drive_h))
            floors, times = [], []
            for _ in range(7):
                t0 = time.time()
                np.asarray(floor_fn(drive_h))
                floors.append(time.time() - t0)
                t0 = time.time()
                o = compiled(ctx_h, drive_h, items)
                np.asarray(o.cs[0].dual if o.cs[0].dual is not None
                           else o.cs[0].primal)
                times.append(time.time() - t0)
            slope = (min(times) - min(floors)) / nb
            raw = min(times) / nb
            print(f"bootstrap wall(lazy={lazy}): {slope*1e3:.1f} "
                  f"ms/refresh (batch={nb}, min run={min(times):.3f}s "
                  f"dispatch floor={min(floors):.3f}s); "
                  f"batch-amortized NO-subtraction: {raw*1e3:.1f} ms",
                  flush=True)
            return slope, raw, out
        finally:
            os.environ.pop("TOYFHE_LAZY_GIANT", None)

    slope, raw, out = measure(True)
    eager_slope = None
    if ab:
        eager_slope, _, _ = measure(False)
        print(f"lazy-giant speedup: {eager_slope/slope:.2f}x "
              f"(same session)", flush=True)

    # correctness: decrypt on CPU (radix-2 again — CPU-resident arrays)
    from toyfhe_tpu.core import rlwe as _rlwe
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    err = 0.0
    with jax.default_device(cpu):
        out_h = host(out)
        for i in range(nb):
            oi = _rlwe.ct_index(out_h, i) if batch > 1 else out_h
            got = F.decrypt(kp, oi)
            err = max(err, float(np.max(np.abs(got - all_vals[i]))))
    rec = {
        "metric": f"ckks_bootstrap_ms_n2^{logn}"
                  + (f"_dnum{dnum}" if dnum else "")
                  + (f"_b{batch}" if batch > 1 else "")
                  + (f"_sl{sl}" if sl > 1 else ""),
        "value": round(slope * 1e3, 1), "unit": "ms/refresh",
        "raw_ms_per_refresh": round(raw * 1e3, 1),   # no floor subtraction
        "out_levels": out.ring.nlimbs, "max_err": err,
        "backend": jax.default_backend()}
    if eager_slope is not None:
        rec["eager_giant_ms"] = round(eager_slope * 1e3, 1)
        rec["lazy_giant_speedup"] = round(eager_slope / slope, 2)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
