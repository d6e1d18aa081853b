"""Round-5 in-kernel MFU lever A/B: four-step factorization n1=128
(n2=64 at N=2^13 — HALF the VPU lanes padded on every in-kernel
elementwise op) vs n1=64 (n2=128 — full-lane minor dim everywhere).

Round-4 VERDICT item 3 named the kernel's VPU recombination and the
elementwise Montgomery chains as the job-MFU floor. The minor-dim lane
analysis gives a concrete mechanism: Mosaic tiles the minor-most axis
to 128 lanes, so every (·, 64) array at N=2^13 runs digits/combines/
twiddles at ≤50% lane utilization. Tables built with n1 = N/128 put
128 in the minor dim of every in-kernel elementwise pass (bit-equal:
tests/test_ntt_pallas.py::test_mxu_nat_n1_factorizations).

Methodology: all flavors interleaved round-robin in ONE rep loop
(docs/performance.md round-4 lesson — sequential per-flavor timing
produces phantom ratios on this tunnel), chained-slope per flavor at
BOTH short (1→7) and long (8→24) chain granularity; device bit-equality
asserted before any timing.

Usage: python -u tools/bench_mfu_levers.py [logn] [L] [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np

SOL_STEPS = 82e3     # transform-bound speed of light (docs/performance.md)


def _chain_times(flavors, reps=7):
    """Interleaved chained timing: flavors = {name: (jitted_fn, arg)};
    returns {name: [times...]} with every flavor measured in every rep."""
    out = {k: [] for k in flavors}
    for r in range(reps):
        order = list(flavors.items())
        if r % 2:
            order = order[::-1]
        for name, (fn, arg) in order:
            t0 = time.perf_counter()
            np.asarray(jax_block(fn(arg)))
            out[name].append(time.perf_counter() - t0)
    return out


def jax_block(x):
    import jax
    return jax.tree_util.tree_leaves(x)[0]


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    from toyfhe_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import toyfhe_tpu as F
    from toyfhe_tpu.ops import ntt_mxu as mxu
    from toyfhe_tpu.ops import ntt_mxu_pallas as mxp
    from toyfhe_tpu.parallel import ops as pops

    n = 1 << logn
    interp = jax.default_backend() != "tpu"   # CPU smoke: pallas interpreter
    print(f"backend={jax.default_backend()} N=2^{logn} L={L} batch={batch}"
          f"{' (interpret)' if interp else ''}", flush=True)

    # ---- two table sets over the SAME primes ----
    os.environ.pop("TOYFHE_MXU_N1", None)
    ringA = F.make_rns_ring(n, (28,) * L + (29,) * 4)
    os.environ["TOYFHE_MXU_N1"] = str(max(8, n // 128))
    ringB = F.make_rns_ring(n, (28,) * L + (29,) * 4)
    os.environ.pop("TOYFHE_MXU_N1", None)
    assert ringA.primes == ringB.primes
    mtA = mxu.MxuNttTables(ringA.tables)                 # n1=128
    mtB = mxu.MxuNttTables(ringB.tables, n1=max(8, n // 128))
    print(f"A: n1={mtA.n1} n2={mtA.n2}   B: n1={mtB.n1} n2={mtB.n2}",
          flush=True)

    rng = np.random.default_rng(0)
    lim = min(ringA.primes)
    x = jnp.asarray(rng.integers(0, lim, (8, L, n)).astype(np.uint32))

    # device bit-equality of the transforms
    fa = np.asarray(mxp.ntt_mxu_nat(mtA, x, interp))
    fb = np.asarray(mxp.ntt_mxu_nat(mtB, x, interp))
    assert np.array_equal(fa, fb), "fwd factorizations disagree on device"
    ia = np.asarray(mxp.intt_mxu_nat(mtA, x, interp))
    ib = np.asarray(mxp.intt_mxu_nat(mtB, x, interp))
    assert np.array_equal(ia, ib), "inv factorizations disagree on device"
    print("device bit-equality: transforms OK", flush=True)

    # ---- NTT-granularity chains (fwd∘inv pairs keep shapes fixed).
    # Chains return a 128-lane slice: execution of the whole chain is
    # data-dependent, but the host transfer drops from ~2 MB to 512 B —
    # at these sub-ms slopes the tunnel's per-MB transfer jitter was
    # the dominant noise term (first r5 session: negative slopes). ----
    def ntt_chain(mt, K):
        @jax.jit
        def f(a):
            for _ in range(K):
                a = mxp.intt_mxu_nat(mt, mxp.ntt_mxu_nat(mt, a, interp),
                                     interp)
            return a[0, 0, :128]
        return f

    # ---- fused keyswitch steps over each table set (dnum=2/k=4) ----
    def build_step(ring):
        params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), 2, 4)
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        kp = F.keygen(params, ks[0])
        ek = F.keygen_eval_mult(ks[1], kp.priv)
        step, _ = pops.make_hybrid_fused_step(params, ek)
        return step

    def build_step_vmem(ring):
        """VMEM-fused digit pipeline (FusedHybridKS: FBC + NTT + key
        contraction per grid cell, digit tensor never in HBM) — the
        round-2 lever re-benched under full-lane tables."""
        params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), 2, 4)
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        kp = F.keygen(params, ks[0])
        ek = F.keygen_eval_mult(ks[1], kp.priv)
        step, _ = pops.make_hybrid_sharded_step(None, params, ek,
                                                fused=True)
        return step

    t0 = time.time()
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        stepA = build_step(ringA)
        stepB = build_step(ringB)
        stepV = build_step_vmem(ringB)
    os.environ.pop("TOYFHE_NTT_IMPL", None)
    print(f"keygen+build (cpu): {time.time()-t0:.0f}s", flush=True)

    cts = jnp.asarray(rng.integers(0, lim, (batch, 2, L, n))
                      .astype(np.uint32))
    cts16 = jnp.asarray(rng.integers(0, lim, (4 * batch, 2, L, n))
                        .astype(np.uint32))
    cts32 = jnp.asarray(rng.integers(0, lim, (8 * batch, 2, L, n))
                        .astype(np.uint32))
    cts64 = jnp.asarray(rng.integers(0, lim, (16 * batch, 2, L, n))
                        .astype(np.uint32))
    sa = np.asarray(stepA(cts))
    sb = np.asarray(stepB(cts))
    assert np.array_equal(sa, sb), "fused steps disagree on device"
    sv = np.asarray(stepV(cts))
    assert np.array_equal(sa, sv), "VMEM-fused step disagrees on device"
    print("device bit-equality: fused + VMEM steps OK", flush=True)

    def step_chain(step, K):
        @jax.jit
        def f(c):
            for _ in range(K):
                out = step(c)
                c = c.at[:, :, : L - 1, :].set(out[:, :, : L - 1, :])
            return c[0, 0, 0, :128]
        return f

    # compile all chains first (cold compiles OUTSIDE the timed loops)
    chains = {}
    for name, (mk, arg, kpair) in {
        "ntt_A128": (lambda K: ntt_chain(mtA, K), x, (1, 5)),
        "ntt_B": (lambda K: ntt_chain(mtB, K), x, (1, 5)),
        "step_A128_s": (lambda K: step_chain(stepA, K), cts, (1, 7)),
        "step_B_s": (lambda K: step_chain(stepB, K), cts, (1, 7)),
        "step_A128_l": (lambda K: step_chain(stepA, K), cts, (8, 24)),
        "step_B_l": (lambda K: step_chain(stepB, K), cts, (8, 24)),
        "step_V_s": (lambda K: step_chain(stepV, K), cts, (1, 7)),
        "step_V_l": (lambda K: step_chain(stepV, K), cts, (8, 24)),
        "step_B16_l": (lambda K: step_chain(stepB, K), cts16, (8, 24)),
        "step_B32_l": (lambda K: step_chain(stepB, K), cts32, (6, 18)),
        "step_B64_l": (lambda K: step_chain(stepB, K), cts64, (4, 12)),
    }.items():
        ks, kb = kpair
        fs, fb_ = mk(ks), mk(kb)
        np.asarray(fs(arg)); np.asarray(fb_(arg))
        chains[name] = (fs, fb_, arg, ks, kb)

    # ---- interleaved measurement: every (flavor, chain-len) each rep,
    # TWO spaced passes (a transient stall cannot cover every rep) ----
    reps = 10
    times = {k: {"s": [], "b": []} for k in chains}
    for p in range(2):
        if p:
            time.sleep(1.5)
        for r in range(reps):
            order = list(chains.items())
            if r % 2:
                order = order[::-1]
            for name, (fs, fb_, arg, ks, kb) in order:
                t0 = time.perf_counter()
                np.asarray(fs(arg))
                times[name]["s"].append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                np.asarray(fb_(arg))
                times[name]["b"].append(time.perf_counter() - t0)

    result = {}
    for name, (fs, fb_, arg, ks, kb) in chains.items():
        slope = (min(times[name]["b"]) - min(times[name]["s"])) / (kb - ks)
        result[name] = slope
        unit = (8 * L if name.startswith("ntt")
                else (4 * batch if "B16" in name
                      else (8 * batch if "B32" in name
                            else (16 * batch if "B64" in name else batch))))
        kind = "pair-transform" if name.startswith("ntt") else "step"
        per_s = unit / slope if slope > 0 else float("nan")
        line = f"{name:14s}: {slope*1e3:8.3f} ms/chain-unit  {per_s:10.1f} {kind}/s"
        if kind == "step" and slope > 0:
            line += f"  job-MFU={per_s / SOL_STEPS * 100:.1f}%"
        print(line, flush=True)

    ratios = {
        "ntt_B_vs_A": result["ntt_A128"] / result["ntt_B"],
        "step_short_B_vs_A": result["step_A128_s"] / result["step_B_s"],
        "step_long_B_vs_A": result["step_A128_l"] / result["step_B_l"],
        "step_long_VMEM_vs_B": result["step_B_l"] / result["step_V_l"],
        "step_batch16_throughput_vs_4": (4 * batch / result["step_B16_l"])
        / (batch / result["step_B_l"]),
        "step_batch32_throughput_vs_4": (8 * batch / result["step_B32_l"])
        / (batch / result["step_B_l"]),
        "step_batch64_throughput_vs_4": (16 * batch / result["step_B64_l"])
        / (batch / result["step_B_l"]),
    }
    for k, v in ratios.items():
        print(f"{k}: {v:.3f}x", flush=True)
    mfu = {
        "A128_long": batch / result["step_A128_l"] / SOL_STEPS,
        "B_long": batch / result["step_B_l"] / SOL_STEPS,
        "VMEM_long": batch / result["step_V_l"] / SOL_STEPS,
        "B16_long": 4 * batch / result["step_B16_l"] / SOL_STEPS,
        "B32_long": 8 * batch / result["step_B32_l"] / SOL_STEPS,
        "B64_long": 16 * batch / result["step_B64_l"] / SOL_STEPS,
    }
    print(json.dumps({
        "metric": f"mfu_levers_n2^{logn}",
        "n1_A": mtA.n1, "n1_B": mtB.n1,
        "slopes_ms": {k: round(v * 1e3, 4) for k, v in result.items()},
        "ratios": {k: round(v, 3) for k, v in ratios.items()},
        "job_mfu_long": {k: round(v, 4) for k, v in mfu.items()},
        "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
