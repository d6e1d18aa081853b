"""Jitted PUBLIC-API multi-op program vs eager dispatch on the TPU chip
(round-4 VERDICT item 8 / ROADMAP item 5: the batched engine front-end).

The eager core API is pytree-registered, so a whole reference-shaped
program — square → relinearize → rescale → rotate → plaintext-diagonal
multiply → add (the ops of infer.jl:135-167) — composes under ONE
``jax.jit``, with keys as device-resident pytree arguments, and runs
bit-identically to eager (tests/test_jit_api.py). This tool measures
what that buys at serving time:

  * EAGER: each public-API call dispatches its own ops over the tunnel;
  * JIT: the same API calls trace once into one XLA program;
  * JIT-BATCHED: the same program over a ``ct_stack`` batch (leading
    ciphertext axis — P3 ciphertext/batch parallelism on one chip).

Timing uses the bench.py chained-slope methodology (block_until_ready
does not synchronize over this tunnel): the jit rows chain K programs
data-dependently inside an outer jit; the eager row is wall-clock over
R repeats with a final forced transfer (eager cannot chain, which IS
the point being measured — per-op tunnel dispatch).

Usage: python -u tools/bench_jit_api.py [logn] [L] [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    from toyfhe_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()   # persistent XLA cache: warm 2nd-session compiles
    from fractions import Fraction

    import toyfhe_tpu as F
    from toyfhe_tpu.core import ring as ringops
    from toyfhe_tpu.core import rlwe

    cpu = jax.devices("cpu")[0]
    n = 1 << logn

    t0 = time.time()
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    with jax.default_device(cpu):
        ring = F.make_rns_ring(n, (28,) * L + (29,) * 4)
        params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), 2, 4)
        ks = jax.random.split(jax.random.PRNGKey(0), 5)
        kp = F.keygen(params, ks[0])
        ek = F.keygen_eval_mult(ks[1], kp.priv)
        gk = F.keygen_galois(ks[2], kp.priv, steps=1)
        scale = Fraction(2) ** 28
        vals = np.linspace(0.1, 1.0, n // 2)
        diag = np.cos(np.arange(n // 2) * 0.1)
        c0 = F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals, scale),
                       ks[3])
        cts = [F.encrypt(kp, F.make_plaintext(params.ring_cipher, vals,
                                              scale),
                         jax.random.fold_in(ks[4], i))
               for i in range(batch)]
    os.environ.pop("TOYFHE_NTT_IMPL", None)
    print(f"setup (cpu): {time.time()-t0:.0f}s  N=2^{logn} L={L}+4 "
          f"batch={batch}", flush=True)

    host = lambda t: jax.tree_util.tree_map(np.asarray, t)
    ek_d = jax.device_put(host(ek))
    gk_d = jax.device_put(host(gk))
    c_d = jax.device_put(host(c0))
    stack_d = jax.device_put(host(rlwe.ct_stack(cts)))

    def program(ek_, gk_, c):
        """The reference multi-op block (infer.jl:135-167) through the
        public API: square+relin+rescale, rotate, diagonal mul, add."""
        s = F.ct_rescale(F.keyswitch(ek_, F.ct_mul(c, c)))
        r = F.rotate(gk_, s)
        m = F.mul_plain_vector(r, diag)
        return F.ct_add(m, F.mul_plain_vector(s, diag))

    def out_arr(ct):
        x = ct.cs[0]
        return x.dual if x.dual is not None else x.primal

    # ---- eager row: R sequential public-API programs on device ----
    R = 3
    np.asarray(out_arr(program(ek_d, gk_d, c_d)))     # warm the op jits
    t0 = time.time()
    for _ in range(R):
        out = program(ek_d, gk_d, c_d)
    np.asarray(out_arr(out))
    eager_s = (time.time() - t0) / R

    # ---- jit row: chained-slope over ONE compiled program. Long
    # chains + a 512-byte output slice: the sub-ms jitted program is far
    # below the tunnel's per-MB transfer jitter ----
    from bench import _slope_time

    def chain(K):
        @jax.jit
        def f(c):
            for _ in range(K):
                o = program(ek_d, gk_d, c)
                # re-embed at the input tower for a fixed-shape chain
                cs = tuple(
                    F.RingElt(dual=jax.numpy.concatenate(
                        [ringops.ensure_dual(o.ring, x).dual,
                         ringops.ensure_dual(c.ring, y).dual[..., -1:, :]],
                        axis=-2))
                    for x, y in zip(o.cs, c.cs))
                c = F.CipherText(c.params, cs, c.ring, enc=c.enc)
            return ringops.ensure_dual(c.ring, c.cs[0]).dual[..., 0, :128]
        return f

    # steps/s SoL ~82k at N=2^13 scales ~2x at N=2^12; floor generously
    tj, spj = _slope_time(chain, (c_d,), k_small=4, k_big=24, reps=9,
                          sol_time=1 / 300e3)
    jit_s = tj

    # ---- jit-batched row: same chain over the ct_stack batch ----
    tb, spb = _slope_time(chain, (stack_d,), k_small=4, k_big=24, reps=9,
                          sol_time=batch / 300e3)
    batched_s = tb / batch

    print(f"eager  : {eager_s*1e3:9.3f} ms/program", flush=True)
    print(f"jit    : {jit_s*1e3:9.3f} ms/program   "
          f"({eager_s/jit_s:.1f}x vs eager)", flush=True)
    print(f"jit+B{batch}: {batched_s*1e3:8.3f} ms/program-ct "
          f"({eager_s/batched_s:.1f}x vs eager)", flush=True)
    sp_ms = lambda sp: [round(v * 1e3, 3) if np.isfinite(v) else None
                        for v in sp]
    print(json.dumps({
        "metric": f"jit_api_program_n2^{logn}",
        "eager_ms": round(eager_s * 1e3, 3),
        "jit_ms": round(jit_s * 1e3, 3),
        "jit_ms_spread": sp_ms(spj),
        "jit_batched_ms_spread": sp_ms(spb),
        "jit_batched_ms_per_ct": round(batched_s * 1e3, 3),
        "batch": batch,
        "jit_speedup": round(eager_s / jit_s, 2),
        "batched_speedup": round(eager_s / batched_s, 2),
        "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
