"""Bootstrapped encrypted-MNIST inference at the REFERENCE shape on TPU.

Round-2 VERDICT item 3: the depth-unlimited pipeline
(conv → square → dense1 → square → BOOTSTRAP → dense2) at the
reference's own geometry — N=2^13, 49 ciphertexts, 64-rotation dense
layers (infer.jl:97-110) — with the composite-scale refresh config
validated at production N (docs/performance.md).

Usage:  python -u tools/bench_boot_mnist.py [logN] [depth] [steps]
        (defaults: logN=13, depth=46, steps=1200)

Execution plan (same split as tools/bench_bootstrap.py):
  * model training + FHE setup + input encryption run EAGERLY ON CPU
    (radix-2; eager dispatch over the TPU tunnel is pathological);
  * the pipeline stages run eagerly on the TPU (per-op jits, MXU
    transforms — the r01 full-shape run served this way);
  * the refresh compiles ONCE via the trace_plain_cache + jit replay
    path (diagonals as device-resident arguments, not HLO constants).

Prints label agreement vs the plaintext model + stage wall times, and a
final JSON record line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 46
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1200

    import jax
    import toyfhe_tpu as F
    from toyfhe_tpu.core import bootstrap as B
    from toyfhe_tpu.models import mnist as M

    cpu = jax.devices("cpu")[0]
    host = lambda t: jax.tree_util.tree_map(np.asarray, t)

    cfg = M.MNISTConfig(ring_logn=logn)
    t0 = time.time()
    os.environ["TOYFHE_NTT_IMPL"] = "radix2"
    with jax.default_device(cpu):
        kt, kf, ke = jax.random.split(jax.random.PRNGKey(0), 3)
        params, acc = M.train(cfg, kt, steps=steps, lr=1e-3)
        print(f"train (cpu): {time.time()-t0:.0f}s  held-out acc={acc:.4f}",
              flush=True)
        t0 = time.time()
        # the validated composite recipe (test_composite_scale_bootstrap)
        setup, ctx = M.fhe_setup_bootstrapped(
            cfg, kf, depth=depth, K=5.0, deg=24, scale_limbs=2, radix=16,
            arcsin=True, double_angle=2, hamming_weight=4)
        print(f"fhe setup (cpu): {time.time()-t0:.0f}s  "
              f"ring={setup.params.ring_cipher}  "
              f"rotkeys={len(ctx.gks.keys)}", flush=True)

        imgs, labels = M.load_real_digits(cfg)
        imgs = np.asarray(imgs)[:cfg.batch]
        plain = np.asarray(M.model_forward(cfg, params, imgs))
    os.environ.pop("TOYFHE_NTT_IMPL", None)

    # device-resident keys/context: host numpy jit args re-cross the
    # tunnel every call
    setup.kp = jax.device_put(host(setup.kp))
    setup.ek = jax.device_put(host(setup.ek))
    setup.gk = jax.device_put(host(setup.gk))
    ctx_dev = jax.device_put(host(ctx))

    state = {}

    # At production N the whole-refresh program passes the upload limit
    # (row-view tables) but can OOM the remote compile helper — the
    # successful N=2^13 runs all went through the three-program PHASED
    # replay (docs/performance.md round-3/4 table). Default it on there.
    phased = os.environ.get(
        "TOYFHE_BOOT_PHASED", "1" if logn >= 12 else "0") == "1"

    def refresh_fn(c):
        if "fn" not in state:
            t1 = time.time()
            os.environ["TOYFHE_NTT_IMPL"] = "radix2"
            with jax.default_device(cpu):
                if phased:
                    i1, i2, i3, _ = B.trace_plain_cache_phased(
                        host(ctx), host(c))
                    items = (i1, i2, i3)
                    state["fn"] = B.jit_bootstrap_replay_phased(
                        host(ctx), host(c))
                else:
                    items = B.trace_plain_cache(host(ctx), host(c))
                    state["fn"] = B.jit_bootstrap_replay()
            os.environ.pop("TOYFHE_NTT_IMPL", None)
            items = jax.tree_util.tree_map(np.asarray, items)
            leaves = jax.tree_util.tree_leaves(items)
            mb = sum(x.nbytes for x in leaves) / 1e6
            print(f"refresh record (cpu trace{' phased' if phased else ''}):"
                  f" {time.time()-t1:.0f}s "
                  f"({len(leaves)} diagonal tensors, {mb:.0f} MB)",
                  flush=True)
            state["items"] = jax.device_put(items)
        t1 = time.time()
        out = state["fn"](ctx_dev, c, state["items"])
        arr = out.cs[0].dual if out.cs[0].dual is not None \
            else out.cs[0].primal
        np.asarray(arr)
        print(f"refresh (compile+run 1st / run): {time.time()-t1:.0f}s",
              flush=True)
        return out

    compiled = os.environ.get("TOYFHE_BOOT_COMPILED", "1") == "1"
    t0 = time.time()
    if compiled:
        # round-4 VERDICT item 4: per-stage jits at each tower level
        # (build_bootstrapped_pipeline) replace the eager per-op
        # dispatch; the first call pays the stage compiles, the second
        # is the WARM serving wall.
        run = M.build_bootstrapped_pipeline(setup, ctx_dev, params,
                                            prescale=32.0,
                                            refresh_fn=refresh_fn)
        logits, depth_out = run(imgs, ke)
        wall = time.time() - t0
        t0 = time.time()
        logits2, _ = run(imgs, ke)
        warm = time.time() - t0
        assert np.array_equal(logits2, logits), "warm run not bit-stable"
        print(f"compiled pipeline: compile+first {wall:.0f}s, "
              f"WARM {warm:.0f}s", flush=True)
    else:
        logits, depth_out = M.encrypted_inference_bootstrapped(
            setup, ctx_dev, params, imgs, ke, prescale=32.0,
            refresh_fn=refresh_fn)
        wall = time.time() - t0
        warm = None
    err = float(np.abs(logits.T - plain).max())
    agree = float((np.argmax(logits.T, -1) == np.argmax(plain, -1)).mean())
    print(f"pipeline wall: {wall:.0f}s  depth_out={depth_out}  "
          f"max|Δlogit|={err:.2e}  label agreement={agree:.4f}", flush=True)
    print(json.dumps({
        "metric": f"bootstrapped_mnist_n2^{logn}",
        "value": agree, "unit": "label_agreement",
        "batch": int(cfg.batch), "depth_out": int(depth_out),
        "max_logit_err": err, "pipeline_wall_s": round(wall, 1),
        "warm_wall_s": None if warm is None else round(warm, 1),
        "compiled_stages": compiled,
        "plain_holdout_acc": round(float(acc), 4),
        "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
