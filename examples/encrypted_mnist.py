"""Encrypted CNN inference, end to end — the reference's flagship example
(examples/encrypted_mnist/infer.jl) at full scale.

Full config mirrors the reference geometry: 28×28 images, 7×7 kernel
stride 3 → 64 positions, N=2^13 CKKS ring → 64-image batch, 49
ciphertexts, 64-rotation diagonal matmuls, ModulusRaised special prime.

Run scaled-down (CPU-friendly):  python -u examples/encrypted_mnist.py --small
Run full size (TPU):             python -u examples/encrypted_mnist.py
"""

import argparse
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")
from toyfhe_tpu.models import mnist as M


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--eager", action="store_true",
                    help="use the eager engine instead of compiled layers")
    ap.add_argument("--bsgs", action="store_true",
                    help="hoisted BSGS dense layers (2sqrt(d) keyswitches)")
    ap.add_argument("--steps", type=int, default=3000,
                    help="training steps; >=300 enables the augmented "
                         "minibatch path (97%+ held-out on real digits)")
    args = ap.parse_args()

    if args.small:
        cfg = M.MNISTConfig(image=14, kernel=5, stride=3, channels=2,
                            classes=4, ring_logn=9)
    else:
        cfg = M.MNISTConfig()   # reference-shaped: N=2^13, 49 cts, 64 rots

    print(f"config: {cfg.image}x{cfg.image} imgs, {cfg.kernel}x{cfg.kernel} "
          f"kernel, {cfg.positions} positions, batch {cfg.batch}, "
          f"N=2^{cfg.ring_logn}, tower {cfg.limb_bits}", flush=True)

    kt, kf, ke = jax.random.split(jax.random.PRNGKey(0), 3)
    t0 = time.time()
    params, acc = M.train(cfg, kt, steps=args.steps, lr=1e-3)
    print(f"plaintext model trained: acc={acc:.3f} ({time.time()-t0:.1f}s)",
          flush=True)

    imgs, labels = M.synthetic_dataset(cfg, jax.random.PRNGKey(1), cfg.batch)
    imgs = np.asarray(imgs)
    plain_logits = np.asarray(M.model_forward(cfg, params, imgs))

    t0 = time.time()
    setup = M.fhe_setup(cfg, kf)
    print(f"FHE setup (keygen + eval/galois keys): {time.time()-t0:.1f}s",
          flush=True)

    gks = None
    if args.bsgs:
        t0 = time.time()
        gks = M.keygen_matmul_bsgs(setup, jax.random.PRNGKey(4))
        print(f"BSGS galois keys ({len(gks.keys)}): {time.time()-t0:.1f}s",
              flush=True)

    t0 = time.time()
    if args.eager:
        enc_logits = M.encrypted_inference(setup, params, imgs, ke,
                                           gks_bsgs=gks)
    else:
        enc_logits = M.encrypted_inference_fast(setup, params, imgs, ke,
                                                gks_bsgs=gks)
    dt = time.time() - t0
    print(f"encrypted inference (cold, incl. compiles): {dt:.1f}s for "
          f"{cfg.batch} images ({dt/cfg.batch*1e3:.0f} ms/image)", flush=True)
    if not args.eager:
        t0 = time.time()
        enc_logits = M.encrypted_inference_fast(setup, params, imgs, ke,
                                                gks_bsgs=gks)
        dt = time.time() - t0
        print(f"encrypted inference (warm, serving rate): {dt:.1f}s for "
              f"{cfg.batch} images ({dt/cfg.batch*1e3:.0f} ms/image)",
              flush=True)

    err = np.abs(enc_logits.T - plain_logits).max()
    plain_lbl = np.argmax(plain_logits, -1)
    enc_lbl = np.argmax(enc_logits.T, -1)
    agree = (plain_lbl == enc_lbl).mean()
    print(f"max |enc - plain| logit error: {err:.4g}")
    print(f"label agreement encrypted vs plaintext: {agree*100:.1f}%")
    print(f"accuracy vs synthetic labels: plain "
          f"{(plain_lbl == np.asarray(labels)).mean()*100:.1f}%, encrypted "
          f"{(enc_lbl == np.asarray(labels)).mean()*100:.1f}%")


if __name__ == "__main__":
    main()
