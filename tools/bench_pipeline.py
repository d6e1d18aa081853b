"""Serving-pipeline A/B on the real TPU chip: primal-boundary layers vs
the dual-domain flow (round-3 VERDICT item 3; parallel/layers.py +
models/mnist.py::build_inference_pipeline(dual_flow=...)).

Full reference MNIST shape (N=2^13, 49 cts, 64-slot dense layers,
hybrid gadget, BSGS dense layers — infer.jl:97-176). Setup runs eagerly
on host CPU (eager dispatch over the TPU tunnel is pathological); each
pipeline's layer jits compile on the first run; warm runs are timed with
the min-estimator (tunnel noise is additive).

Usage:  python -u tools/bench_pipeline.py [steps] [reps]
        (defaults: steps=120 training steps, reps=5 warm timed runs)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax
    from toyfhe_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()   # persistent XLA cache: warm 2nd-session compiles
    import toyfhe_tpu as F
    from toyfhe_tpu.models import mnist as M

    cpu = jax.devices("cpu")[0]
    host = lambda t: jax.tree_util.tree_map(np.asarray, t)

    cfg = M.MNISTConfig()
    t0 = time.time()
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    with jax.default_device(cpu):
        kt, kf, ke = jax.random.split(jax.random.PRNGKey(0), 3)
        data = M.synthetic_dataset(cfg, jax.random.PRNGKey(8), 512)
        params, acc = M.train(cfg, kt, steps=steps, data=data)
        setup = M.fhe_setup(cfg, kf)
        gks = M.keygen_matmul_bsgs(setup, jax.random.PRNGKey(9))
        imgs = np.asarray(M.synthetic_dataset(cfg, jax.random.PRNGKey(3),
                                              cfg.batch)[0])
    os.environ.pop("TOYFHE_NTT_IMPL", None)
    print(f"setup (cpu): {time.time()-t0:.0f}s  train acc={acc:.3f}",
          flush=True)

    # device-resident keys: host numpy pytree args re-cross the tunnel
    # on every call
    setup.kp = jax.device_put(host(setup.kp))
    setup.ek = jax.device_put(host(setup.ek))
    setup.gk = jax.device_put(host(setup.gk))
    gks = jax.device_put(host(gks))

    def block(ct):
        np.asarray(ct.cs[0].dual if ct.cs[0].dual is not None
                   else ct.cs[0].primal)

    results = {}
    out_cts = {}
    for flavor, dual in (("primal", False), ("dual", True)):
        t0 = time.time()
        pipe = M.build_inference_pipeline(setup, params, gks_bsgs=gks,
                                          dual_flow=dual)
        print(f"[{flavor}] build: {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        out = pipe(imgs, ke, _return_ct=True)
        block(out)
        print(f"[{flavor}] first run (compiles): {time.time()-t0:.0f}s",
              flush=True)
        times = []
        for _ in range(reps):
            t0 = time.time()
            out = pipe(imgs, ke, _return_ct=True)
            block(out)
            times.append(time.time() - t0)
        results[flavor] = min(times)
        out_cts[flavor] = host(out)
        print(f"[{flavor}] warm: min {min(times):.3f}s over {reps} "
              f"(all: {[round(t, 3) for t in times]})", flush=True)

    # correctness: both flavors must produce identical logits (bit-exact
    # residue comparison on the final ciphertext)
    same = all(
        np.array_equal(np.asarray(a.dual), np.asarray(b.dual))
        for a, b in zip(out_cts["primal"].cs, out_cts["dual"].cs))
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    with jax.default_device(cpu):
        dec = F.decrypt(setup.kp if not hasattr(setup.kp, "priv") else
                        jax.tree_util.tree_map(np.asarray, setup.kp),
                        out_cts["dual"]).real
        mat = dec.reshape(cfg.positions, cfg.batch)
        enc_labels = np.argmax(mat[:cfg.classes, :].T, -1)
        plain = np.asarray(M.model_forward(cfg, params, imgs))
        agree = float(np.mean(enc_labels == np.argmax(plain, -1)))
    rec = {"metric": "mnist_pipeline_s_per_batch",
           "primal_s": round(results["primal"], 3),
           "dual_s": round(results["dual"], 3),
           "speedup": round(results["primal"] / results["dual"], 3),
           "bit_equal": bool(same), "label_agreement": agree,
           "batch": cfg.batch, "backend": jax.default_backend()}
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
