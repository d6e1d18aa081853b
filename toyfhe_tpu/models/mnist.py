"""Encrypted CNN inference (layer L6) — the end-to-end flagship workload.

Rebuilds ``/root/reference/examples/encrypted_mnist/``: a small CNN with
x² activations (conv → square → dense → square → dense, [JKLS19]-style)
evaluated homomorphically under CKKS with the special-prime modifier.

Pipeline structure mirrors ``infer.jl``:
  * ``public_preprocess``      — batch → k×k grid of patch-position
    vectors packed so each ciphertext holds (batch × positions) slots
    (infer.jl:58-65);
  * conv = plain-scalar muls + adds over the grid + bias + rescale
    (infer.jl:126-130);
  * square = ct·ct → relinearize → rescale (infer.jl:135-137);
  * dense = rotation-based diagonal matmul, one Galois rotation per
    matrix column block (infer.jl:141-150);
  * final rectangular matmul by zero-padding (infer.jl:169-176).

The geometry is parameterized (`MNISTConfig`) so the same pipeline runs
full-size (28×28 images, N=2^13, 49 ciphertexts, 64 rotations — the
reference shape) and scaled-down for CPU tests. Training uses optax on
real handwritten-digit data by default (``load_real_digits``: a local
MNIST copy via ``load_mnist_local``/``$MNIST_PATH`` when one exists —
this zero-egress environment never downloads — else the locally-bundled
UCI handwritten-digits scans from sklearn, resampled to the configured
geometry), falling back to synthetic class-patterned data only when
neither source is present. The pipeline and plain/encrypted
label-agreement checks are dataset-independent.
"""

from __future__ import annotations

import dataclasses
from fractions import Fraction
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import toyfhe_tpu as F


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MNISTConfig:
    image: int = 28          # image side
    kernel: int = 7          # conv kernel side
    stride: int = 3
    channels: int = 4
    classes: int = 10
    ring_logn: int = 13      # CKKS ring: N = 2^logn, slots = N/2
    # Tower shape mirrors infer.jl:97-110's (60, 40×5, special) re-planned
    # to small limbs: 28-bit ct primes with scale 2^28 — the scale matches
    # the rescale primes (keeps scales stable across levels), the three
    # surviving bottom limbs (2^84) cover the final scale²·value range,
    # primes < 2^30 enable Harvey lazy butterflies everywhere, and the
    # last ``num_special`` limbs are the raising primes (29-bit requests
    # so P ≈ 2^116 ≥ α·Q_group = 4·2^112 — the hybrid digit bound — while
    # the whole expanded tower stays under the 2^30 MXU/lazy gate).
    limb_bits: Tuple[int, ...] = (28,) * 7 + (29,) * 4
    scale_log2: int = 28   # scale ≈ rescale-limb size keeps scales stable
    # key-switch gadget: "hybrid" (core/hybrid.py dnum-grouped digits —
    # the PRODUCTION key switch: dnum digit batches instead of L, keys
    # dnum/L the size) or "modraise" (one special prime, per-limb digits,
    # the reference's modulusraising.jl semantics). dnum=2/k=4 is the
    # round-4 default: 46-transform fused census (vs 61 at dnum=4/k=3),
    # half the key-contraction rows and ~45% smaller keys at
    # measured-equal noise (2.24e-3 vs 2.22e-3 for square→relin→rescale
    # at N=2^12 with real keys). Wall-clock effect is inside tunnel
    # noise on this link (docs/performance.md round-4 A/B replication):
    # the claims are op-count and key-size, not a measured speedup.
    gadget: str = "hybrid"
    dnum: int = 2
    num_special: int = 4

    @property
    def positions(self) -> int:            # conv output positions per image
        side = (self.image - self.kernel) // self.stride + 1
        return side * side

    @property
    def grid(self) -> int:
        return self.kernel

    @property
    def batch(self) -> int:
        # slots = batch * positions
        return (1 << self.ring_logn) // 2 // self.positions

    @property
    def features(self) -> int:
        return self.channels * self.positions


def init_params(cfg: MNISTConfig, key):
    k1, k2, k3 = jax.random.split(key, 3)
    d = cfg.positions
    f = cfg.features
    return {
        "conv_w": jax.random.normal(k1, (cfg.kernel, cfg.kernel, cfg.channels)) * 0.2,
        "conv_b": jnp.zeros((cfg.channels,)),
        "w1": jax.random.normal(k2, (d, f)) * (1.0 / np.sqrt(f)),
        "b1": jnp.zeros((d,)),
        "w2": jax.random.normal(k3, (cfg.classes, d)) * (1.0 / np.sqrt(d)),
        "b2": jnp.zeros((cfg.classes,)),
    }


def _patches(cfg: MNISTConfig, batch):
    """[B, H, W] -> [B, positions, kernel*kernel] stride-cropped patches."""
    side = (cfg.image - cfg.kernel) // cfg.stride + 1
    rows = []
    for i in range(side):
        for j in range(side):
            rows.append(batch[:, i * cfg.stride: i * cfg.stride + cfg.kernel,
                              j * cfg.stride: j * cfg.stride + cfg.kernel]
                        .reshape(batch.shape[0], -1))
    return jnp.stack(rows, axis=1)


def model_forward(cfg: MNISTConfig, params, batch):
    """Plaintext forward pass, structured exactly like the encrypted one
    (the reference asserts this equivalence, infer.jl:92)."""
    pt = _patches(cfg, batch)                       # [B, P, k*k]
    w = params["conv_w"].reshape(-1, cfg.channels)  # [k*k, C]
    conv = jnp.einsum("bpk,kc->bpc", pt, w) + params["conv_b"]
    sq1 = conv ** 2
    # feature layout: channel-major blocks of positions (reshape_and_vcat,
    # infer.jl:40-46)
    feats = jnp.concatenate([sq1[:, :, c] for c in range(cfg.channels)], axis=1)
    fq1 = feats @ params["w1"].T + params["b1"]
    sq2 = fq1 ** 2
    return sq2 @ params["w2"].T + params["b2"]


def synthetic_dataset(cfg: MNISTConfig, key, n: int):
    """Deterministic class-patterned images + noise (dataset stand-in)."""
    kimg, klbl, knoise = jax.random.split(key, 3)
    labels = jax.random.randint(klbl, (n,), 0, cfg.classes)
    protos = jax.random.normal(kimg, (cfg.classes, cfg.image, cfg.image))
    imgs = protos[labels] + 0.3 * jax.random.normal(knoise, (n, cfg.image, cfg.image))
    return imgs, labels


_MNIST_CANDIDATES = (
    "{root}/train-images-idx3-ubyte.gz", "{root}/train-images.idx3-ubyte",
    "{root}/MNIST/raw/train-images-idx3-ubyte.gz",
    "{root}/mnist.npz",
)


def load_mnist_local(root: str = None):
    """(imgs float[N,28,28] in [0,1], labels int[N]) from a LOCAL MNIST
    copy (idx/idx.gz or Keras-style mnist.npz), or None when absent.
    Looks under ``root``, ``$MNIST_PATH``, ``~/.cache/mnist`` and
    ``./data`` — this zero-egress environment never downloads."""
    import gzip
    import os
    import struct

    roots = [r for r in (root, os.environ.get("MNIST_PATH"),
                         os.path.expanduser("~/.cache/mnist"), "data")
             if r]
    for rt in roots:
        for pat in _MNIST_CANDIDATES:
            path = pat.format(root=rt)
            if not os.path.exists(path):
                continue
            if path.endswith(".npz"):
                with np.load(path) as z:
                    return (z["x_train"].astype(np.float32) / 255.0,
                            z["y_train"].astype(np.int64))
            opener = gzip.open if path.endswith(".gz") else open
            with opener(path, "rb") as f:
                magic, n, h, w = struct.unpack(">IIII", f.read(16))
                assert magic == 2051
                imgs = np.frombuffer(f.read(n * h * w), dtype=np.uint8)
            lbl_path = path.replace("images-idx3", "labels-idx1") \
                           .replace("images.idx3", "labels.idx1")
            with opener(lbl_path, "rb") as f:
                magic, n2 = struct.unpack(">II", f.read(8))
                assert magic == 2049 and n2 == n
                labels = np.frombuffer(f.read(n), dtype=np.uint8)
            return (imgs.reshape(n, h, w).astype(np.float32) / 255.0,
                    labels.astype(np.int64))
    return None


def load_real_digits(cfg: MNISTConfig):
    """Real handwritten-digit data for cfg.image-sized inputs.

    Prefers a local MNIST copy (load_mnist_local; 28×28 only). Falls
    back to the locally-bundled UCI handwritten-digits set (sklearn
    ``load_digits``: 1797 real 8×8 scans), nearest-neighbor resampled to
    cfg.image — real data at any test geometry, no network. Returns
    (imgs, labels) or None if neither source exists."""
    if cfg.image == 28:
        local = load_mnist_local()
        if local is not None:
            return local
    try:
        from sklearn.datasets import load_digits
    except ImportError:
        return None
    d = load_digits()
    imgs = d.images.astype(np.float32) / 16.0          # [N, 8, 8] in [0,1]
    labels = d.target.astype(np.int64)
    if cfg.classes < 10:                 # scaled-down test geometries
        keep = labels < cfg.classes
        imgs, labels = imgs[keep], labels[keep]
    if cfg.image != 8:
        # bilinear resample: the x²-CNN's stride-cropped conv sees
        # gradients instead of blocky nearest-neighbor edges (measured
        # +1-2% held-out at 28×28)
        imgs = np.asarray(jax.image.resize(
            jnp.asarray(imgs), (imgs.shape[0], cfg.image, cfg.image),
            "bilinear"))
    return imgs, labels


def train(cfg: MNISTConfig, key, steps: int = 300, lr: float = 1e-3,
          data=None):
    """Train the x²-CNN (train.jl role) with optax Adam.

    ``data`` — (imgs [N,H,W], labels [N]); default tries real digit data
    (load_real_digits: a local MNIST copy, else the bundled sklearn
    digits), then the synthetic stand-in."""
    import optax

    kp, kd = jax.random.split(key)
    params = init_params(cfg, kp)
    if data is None:
        data = load_real_digits(cfg)
    if data is None:
        data = synthetic_dataset(cfg, kd, 512)
    imgs, labels = data
    imgs = np.asarray(imgs)[:2048]
    labels = np.asarray(labels)[:2048]
    # held-out accuracy (the reference reports ~99% TEST accuracy,
    # train.jl:6-7): split 80/20 when the set is big enough to afford it
    n = len(labels)
    ntr = (n * 4) // 5 if n >= 256 else n
    test_imgs = jnp.asarray(imgs[ntr:]) if ntr < n else None
    test_labels = jnp.asarray(labels[ntr:]) if ntr < n else None
    imgs = jnp.asarray(imgs[:ntr])
    labels = jnp.asarray(labels[:ntr])

    if steps >= 300:
        # x² activations square gradients too — warmup + cosine decay +
        # global-norm clipping keep the polynomial network's optimization
        # stable across seeds
        sched = optax.warmup_cosine_decay_schedule(
            0.0, lr, max(50, steps // 20), steps, lr * 0.05)
        opt = optax.chain(optax.clip_by_global_norm(1.0),
                          optax.adam(sched))
    else:
        opt = optax.adam(lr)
    state = opt.init(params)

    # Long runs on real data train with minibatches + random-shift
    # augmentation (the classic digits augmentation; the reference's
    # train.jl reaches ~99% on MNIST-proper with 60k samples — the
    # bundled fallback has 1797 scans, so augmentation carries more of
    # the generalization load). Short runs (unit tests) keep the cheap
    # full-batch path.
    augment = steps >= 300 and int(labels.shape[0]) >= 256
    if augment:
        # host-side rotation pool: small-angle rotations are the other
        # classic digits augmentation; shifts happen per-minibatch below
        try:
            from scipy.ndimage import rotate as _rot
            base_i, base_l = np.asarray(imgs), np.asarray(labels)
            from scipy.ndimage import gaussian_filter, map_coordinates
            pools_i, pools_l = [base_i], [base_l]
            for ang in (-10.0, -5.0, 5.0, 10.0):
                pools_i.append(_rot(base_i, ang, axes=(1, 2), reshape=False,
                                    order=1, mode="constant"))
                pools_l.append(base_l)
            # elastic distortions (Simard et al.): smoothed random
            # displacement fields, the strongest known digits augmentation
            rng_el = np.random.default_rng(7)
            yy, xx = np.meshgrid(np.arange(cfg.image), np.arange(cfg.image),
                                 indexing="ij")
            sigma_el, alpha_el = cfg.image / 7.0, cfg.image / 4.0
            for _ in range(4):
                dy = gaussian_filter(
                    rng_el.uniform(-1, 1, base_i.shape[1:]), sigma_el,
                    mode="constant") * alpha_el
                dx = gaussian_filter(
                    rng_el.uniform(-1, 1, base_i.shape[1:]), sigma_el,
                    mode="constant") * alpha_el
                warped = np.stack([
                    map_coordinates(im, [yy + dy, xx + dx], order=1,
                                    mode="constant")
                    for im in base_i], 0)
                pools_i.append(warped.astype(np.float32))
                pools_l.append(base_l)
            imgs = jnp.asarray(np.concatenate(pools_i, 0))
            labels = jnp.asarray(np.concatenate(pools_l, 0))
        except ImportError:
            pass

    def _shift(img, dy, dx):
        return jnp.roll(jnp.roll(img, dy, axis=0), dx, axis=1)

    @jax.jit
    def step(params, state, key):
        if augment:
            kb, ky, kx = jax.random.split(key, 3)
            nb = min(256, int(labels.shape[0]))
            idx = jax.random.randint(kb, (nb,), 0, labels.shape[0])
            mb, ml = imgs[idx], labels[idx]
            sh = max(1, cfg.image // 8)           # ±1 source px at 28×28
            dy = jax.random.randint(ky, (nb,), -sh, sh + 1)
            dx = jax.random.randint(kx, (nb,), -sh, sh + 1)
            mb = jax.vmap(_shift)(mb, dy, dx)
        else:
            mb, ml = imgs, labels

        def loss_fn(p):
            logits = model_forward(cfg, p, mb)
            if augment:     # label smoothing pairs with the augmentation
                onehot = jax.nn.one_hot(ml, cfg.classes)
                sm = onehot * 0.95 + 0.05 / cfg.classes
                return optax.softmax_cross_entropy(logits, sm).mean()
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, ml).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state2 = opt.update(grads, state)
        return optax.apply_updates(params, updates), state2, loss

    for i in range(steps):
        kd, ks = jax.random.split(kd)
        params, state, loss = step(params, state, ks)
    if test_imgs is not None:
        acc = (jnp.argmax(model_forward(cfg, params, test_imgs), -1)
               == test_labels).mean()
    else:
        acc = (jnp.argmax(model_forward(cfg, params, imgs), -1)
               == labels).mean()
    return params, float(acc)


# ---------------------------------------------------------------------------
# encrypted inference (infer.jl:94-177)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FHESetup:
    cfg: MNISTConfig
    params: "F.ModulusRaised"
    kp: "F.KeyPair"
    ek: "F.EvalMultKey"
    gk: "F.GaloisKey"
    scale: Fraction


# Rescale levels the encrypted_inference circuit consumes: conv,
# square1, dense1, square2 (infer.jl:129-167 — the reference's 4
# modswitches). dense2 decodes UN-rescaled at scale², so the surviving
# tower must still cover 2·|logit|·scale².
PIPELINE_RESCALES = 4


def audit_pipeline_depth(cfg: MNISTConfig, params, scale: Fraction,
                         value_margin_bits: int = 10) -> None:
    """Level accounting for the MNIST circuit: raise loudly at setup
    time when the ct tower (AFTER the gadget partition takes its
    raising primes) is too short for the pipeline's rescale consumption
    plus the final-scale decode range.

    This guard exists because a silently re-partitioned tower (e.g. a
    ``num_special`` default change stealing a data limb) passes every
    algebraic guard (P ≥ α·Q_group, security) yet decodes garbage —
    the round-4 SMALL_HYB failure mode. Depth must be checked against
    the circuit, not only the gadget."""
    import math as _math

    ring = params.ring_cipher                 # ct tower, specials removed
    L = ring.nlimbs
    k = getattr(params, "num_special", 1)
    if L <= PIPELINE_RESCALES:
        raise F.UsageError(
            f"MNIST pipeline needs {PIPELINE_RESCALES} rescales but the ct "
            f"tower has only L={L} data limbs (full tower "
            f"{len(cfg.limb_bits)} limbs minus {k} raising primes). "
            f"Add data limbs or reduce num_special.")
    surviving = _math.prod(ring.primes[:L - PIPELINE_RESCALES])
    final_scale = scale * scale               # dense2 output, un-rescaled
    need = final_scale * (1 << value_margin_bits)
    if surviving < need:
        have_bits = _math.log2(surviving)
        raise F.UsageError(
            f"MNIST pipeline depth check failed: after {PIPELINE_RESCALES} "
            f"rescales the surviving modulus is 2^{have_bits:.1f} but the "
            f"final decode needs ≥ 2^{float(_math.log2(need)):.1f} "
            f"(scale² · 2^{value_margin_bits} margin). The ct tower is "
            f"L={L} data limbs after {k} raising primes — a partition "
            f"change (dnum/num_special) likely stole a data limb. "
            f"Full tower bits: {cfg.limb_bits}.")


def fhe_setup(cfg: MNISTConfig, rng, audit_depth: bool = True) -> FHESetup:
    ring = F.make_rns_ring(1 << cfg.ring_logn, cfg.limb_bits)
    if cfg.gadget == "hybrid":
        params = F.HybridRaised(F.CKKSParams(ring, 0, 3.2), cfg.dnum,
                                cfg.num_special)
    else:
        params = F.ModulusRaised(F.CKKSParams(ring, 0, 3.2))
    if audit_depth:
        audit_pipeline_depth(cfg, params, Fraction(2) ** cfg.scale_log2)
    ks = jax.random.split(rng, 3)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    gk = F.keygen_galois(ks[2], kp.priv, steps=cfg.batch)
    return FHESetup(cfg, params, kp, ek, gk, Fraction(2) ** cfg.scale_log2)


def public_preprocess(cfg: MNISTConfig, batch: np.ndarray) -> np.ndarray:
    """[B, H, W] -> [k, k] grid of slot vectors of length B·positions,
    images fastest (infer.jl:58-65)."""
    b = np.asarray(batch)
    side = (cfg.image - cfg.kernel) // cfg.stride + 1
    out = np.zeros((cfg.kernel, cfg.kernel, cfg.batch * cfg.positions))
    for i in range(cfg.kernel):
        for j in range(cfg.kernel):
            # value of pixel (i,j) within each patch, for every (image, pos)
            vals = np.stack(
                [b[:, pi * cfg.stride + i, pj * cfg.stride + j]
                 for pi in range(side) for pj in range(side)], axis=1)
            out[i, j] = vals.T.reshape(-1)             # images fastest
    return out


def _rep_inner(vec, inner):
    return np.repeat(np.asarray(vec), inner)


def encrypted_matmul(setup: FHESetup, weights: np.ndarray, x):
    """Rotation-based diagonal matmul (infer.jl:141-150): d rotations by
    `batch` slots, diagonal weights repeated `inner=batch`."""
    d = weights.shape[1]
    result = F.mul_plain_vector(x, _rep_inner(np.diag(weights), setup.cfg.batch))
    rotated = x
    for k in range(1, d):
        rotated = F.rotate(setup.gk, rotated)
        diag = np.diag(np.roll(weights, k, axis=1))
        result = F.ct_add(result, F.mul_plain_vector(
            rotated, _rep_inner(diag, setup.cfg.batch)))
    return result


def naive_rectangular_matmul(setup: FHESetup, weights: np.ndarray, x):
    """Zero-pad a short-fat matrix to square then diagonal matmul
    (infer.jl:169-173)."""
    r, c = weights.shape
    assert r <= c
    if r == c:
        return encrypted_matmul(setup, weights, x)
    wpad = np.vstack([weights, np.zeros((c - r, c))])
    return encrypted_matmul(setup, wpad, x)


def keygen_matmul_bsgs(setup: FHESetup, rng, d: Optional[int] = None):
    """Galois keys for :func:`encrypted_matmul_bsgs`: baby steps
    b·batch slots (b < bs) and giant steps g·bs·batch (g < gs) —
    O(√d) keys instead of the single iterated step-`batch` key."""
    from ..core import bootstrap as B

    d = d if d is not None else setup.cfg.positions
    bs, gs = B.bsgs_split(d)
    inner = setup.cfg.batch
    steps = sorted({b * inner for b in range(1, bs)}
                   | {g * bs * inner for g in range(1, gs)})
    return F.keygen_galois_set(rng, setup.kp.priv, steps)


def encrypted_matmul_bsgs(setup: FHESetup, gks, weights: np.ndarray, x):
    """BSGS rotation matmul with hoisting and lazy ModDown — the
    serving-grade schedule for the dense layers (beyond the reference's
    d-rotation loop, infer.jl:141-150):

      * baby rotations share ONE gadget decomposition + digit NTT
        (rlwe.rotate_many);
      * giant-step keyswitches accumulate in the raised tower and pay
        ONE contraction for the whole matrix (rlwe.rotate_sum);
      * d diagonal muls total, but only bs+gs−2 ≈ 2√d distinct
        keyswitches (vs d−1 sequential ones).

    Bit-compatible semantics with :func:`encrypted_matmul` (same
    diagonals, same rotations, different — strictly lower-noise —
    keyswitch schedule). ``gks`` from :func:`keygen_matmul_bsgs`."""
    from ..core import rlwe

    terms = _bsgs_matmul_terms(setup, gks, weights, x)
    if not terms:
        return F.mul_plain_vector(x, np.zeros(x.ring.n // 2))
    return rlwe.rotate_sum(gks, terms)


def _bsgs_matmul_terms(setup: FHESetup, gks, weights: np.ndarray, x,
                       inner: Optional[int] = None):
    """The giant-step term list [(galois_element | None, inner_sum)] of
    the BSGS matmul — exposed so several matmuls feeding one sum (the
    per-channel dense1 blocks) can merge their terms and pay a single
    rotate_sum contraction for the whole layer. ``inner`` is the slot
    repeat factor (defaults to the config batch)."""
    from ..core import bootstrap as B
    from ..core import rlwe

    d = weights.shape[1]
    inner = setup.cfg.batch if inner is None else inner
    n = x.ring.n
    bs, gs = B.bsgs_split(d)
    els_b = {b: rlwe.galois_element_for_steps(n, b * inner)
             for b in range(1, bs)}
    hoisted = rlwe.rotate_many(gks, x, sorted(set(els_b.values())))
    baby_ct = {0: x, **{b: hoisted[e] for b, e in els_b.items()}}
    terms = []
    for g in range(gs):
        acc = None
        for b in range(bs):
            k = g * bs + b
            if k >= d:
                break
            diag = np.diag(np.roll(weights, k, axis=1))
            if not np.any(diag):
                continue
            vec = _rep_inner(np.roll(diag, -g * bs), inner)
            term = F.mul_plain_vector(baby_ct[b], vec)
            acc = term if acc is None else F.ct_add(acc, term)
        if acc is None:
            continue
        el = (rlwe.galois_element_for_steps(n, g * bs * inner)
              if g else None)
        terms.append((el, acc))
    return terms


def _zero_product(x):
    """A scale²-tagged zero ciphertext — what an all-zero-weight matmul
    returns (matches encrypted_matmul's zero-diagonal result)."""
    return F.mul_plain_vector(x, np.zeros(x.ring.n // 2))


def _merge_bsgs_terms(term_lists):
    """Merge several matmuls' term lists by galois element (inner sums
    add ciphertext-wise) so rotate_sum decomposes each element once."""
    by_el = {}
    for terms in term_lists:
        for el, ct in terms:
            by_el[el] = ct if el not in by_el else F.ct_add(by_el[el], ct)
    return list(by_el.items())


def encrypted_inference(setup: FHESetup, model_params, batch: np.ndarray,
                        rng, gks_bsgs=None):
    """Full encrypted forward pass (infer.jl:115-177). Returns the
    decrypted logits matrix [classes, B].

    With ``gks_bsgs`` (from :func:`keygen_matmul_bsgs`) the dense layers
    run the hoisted BSGS schedule — ~2√d keyswitches per matmul instead
    of d−1, and dense1's four channel blocks share one lazy-ModDown
    contraction."""
    cfg = setup.cfg
    ring = setup.params.ring_cipher
    I = public_preprocess(cfg, batch)

    # encrypt the k×k ciphertext grid (infer.jl:120-124)
    keys = jax.random.split(rng, cfg.kernel * cfg.kernel)
    C = {}
    for i in range(cfg.kernel):
        for j in range(cfg.kernel):
            pt = F.make_plaintext(ring, I[i, j], setup.scale)
            C[(i, j)] = F.encrypt(setup.kp, pt, keys[i * cfg.kernel + j])

    # conv: plain-scalar muls + adds per output channel (infer.jl:126-130)
    w = np.asarray(model_params["conv_w"])
    bconv = np.asarray(model_params["conv_b"])
    conved = []
    for c in range(cfg.channels):
        acc = None
        for i in range(cfg.kernel):
            for j in range(cfg.kernel):
                term = F.mul_plain_scalar(C[(i, j)], float(w[i, j, c]))
                acc = term if acc is None else F.ct_add(acc, term)
        acc = F.add_plain(acc, float(bconv[c]))
        conved.append(F.ct_rescale(acc))

    # square + relin + rescale (infer.jl:135-137)
    sqed1 = [F.ct_rescale(F.keyswitch(setup.ek, F.ct_mul(x, x)))
             for x in conved]

    # dense1: sum of per-channel-block diagonal matmuls (infer.jl:158-160)
    w1 = np.asarray(model_params["w1"])
    d = cfg.positions
    if gks_bsgs is not None:
        from ..core import rlwe
        fq1 = rlwe.rotate_sum(gks_bsgs, _merge_bsgs_terms(
            [_bsgs_matmul_terms(setup, gks_bsgs, w1[:, ci * d:(ci + 1) * d],
                                sqed1[ci]) for ci in range(cfg.channels)]))
    else:
        fq1 = None
        for ci in range(cfg.channels):
            blk = w1[:, ci * d:(ci + 1) * d]
            part = encrypted_matmul(setup, blk, sqed1[ci])
            fq1 = part if fq1 is None else F.ct_add(fq1, part)
    fq1 = F.add_plain(fq1, _rep_inner(np.asarray(model_params["b1"]), cfg.batch))
    fq1 = F.ct_rescale(fq1)

    # square (infer.jl:165-167)
    sqed2 = F.ct_rescale(F.keyswitch(setup.ek, F.ct_mul(fq1, fq1)))

    # dense2: rectangular matmul + bias (infer.jl:169-177)
    w2 = np.asarray(model_params["w2"])
    if gks_bsgs is not None:
        wpad = np.vstack([w2, np.zeros((d - w2.shape[0], d))])
        out = encrypted_matmul_bsgs(setup, gks_bsgs, wpad, sqed2)
    else:
        out = naive_rectangular_matmul(setup, w2, sqed2)
    b2pad = np.concatenate([np.asarray(model_params["b2"]),
                            np.zeros(d - cfg.classes)])
    out = F.add_plain(out, _rep_inner(b2pad, cfg.batch))

    dec = F.decrypt(setup.kp, out).real
    # rows = positions (class index in first `classes`), cols = images
    mat = dec.reshape(cfg.positions, cfg.batch)
    return mat[:cfg.classes, :]


def fhe_setup_bootstrapped(cfg: MNISTConfig, rng, depth: int = 12,
                           limb_bits: int = 28, scale_log2: int = 28,
                           hamming_weight: int = 4,
                           **boot_kwargs) -> Tuple[FHESetup, object]:
    """FHE setup for DEPTH-UNLIMITED inference: bootstrap-grade params
    (deep ``depth``-limb tower of q₀-sized primes, sparse ternary secret
    bounding the ModRaise overflow, ModulusRaised keyswitching) plus a
    BootstrapContext for the same key. Returns (setup, boot_ctx).

    ``boot_kwargs['scale_limbs']=2`` selects the COMPOSITE-scale config
    (the numerically sound one at N ≥ 2^11, docs/performance.md): a
    2×29-bit base q₀ ≈ 2^58 with 26-bit level limbs; the pipeline runs
    at scale 2^26 per level and the refresh at 2^52 across limb pairs."""
    from ..core import bootstrap as B

    sl = int(boot_kwargs.get("scale_limbs", 1))
    if sl == 2:
        # the validated composite recipe (test_composite_scale_bootstrap,
        # tools/bench_bootstrap.py sl=2): 2×29-bit base, 26-bit level
        # limbs, hybrid dnum gadget with alpha+1 29-bit raising primes,
        # factored transforms + double-angle EvalMod set by the caller
        scale_log2 = 26
        dnum = max(1, (depth + 2) // 5)
        k = -(-(depth + 2) // dnum) + 1
        # BALANCED 26-bit level pairs (make_boot_ring): the composite
        # scale²/pair equilibrium is unstable, so pair products must
        # straddle 2^52 — the N=2^13 refresh root-cause fix
        ring = B.make_boot_ring(1 << cfg.ring_logn, L=depth, num_special=k)
        params = F.HybridRaised(
            F.CKKSParams(ring, 0, 3.2, secret="sparse",
                         hamming_weight=hamming_weight), dnum, k)
    else:
        tower = (limb_bits,) * depth
        ring = F.make_rns_ring(1 << cfg.ring_logn, tower)
        params = F.ModulusRaised(
            F.CKKSParams(ring, 0, 3.2, secret="sparse",
                         hamming_weight=hamming_weight))
    ks = jax.random.split(rng, 4)
    kp = F.keygen(params, ks[0])
    ek = F.keygen_eval_mult(ks[1], kp.priv)
    gk = F.keygen_galois(ks[2], kp.priv, steps=cfg.batch)
    setup = FHESetup(cfg, params, kp, ek, gk, Fraction(2) ** scale_log2)
    ctx = B.setup_bootstrap(ks[3], kp.priv, **boot_kwargs)
    return setup, ctx


def encrypted_inference_bootstrapped(setup: FHESetup, boot_ctx,
                                     model_params, batch: np.ndarray, rng,
                                     prescale: float = 4.0,
                                     refresh_fn=None):
    """Depth-unlimited encrypted forward pass:

        conv → square → dense1 → square → **bootstrap** → dense2

    Same math as :func:`encrypted_inference`, but after the second
    square the ciphertext is deliberately exhausted to the base tower
    and REFRESHED without the secret key (core/bootstrap.py) before the
    final dense layer runs at the regained depth — the composition the
    reference cannot express (ToyFHE has no bootstrap; its MNIST
    pipeline budgets exactly the 6-level tower it needs,
    infer.jl:97-110). Returns decrypted logits [classes, B] and the
    refreshed ciphertext's tower depth.

    ``prescale``: the message is divided by this plain scalar before the
    refresh (EvalMod's sine approximation wants |m| ≲ 1) and the factor
    is folded back into dense2's weights — exact, costs one level
    pre-refresh which the bootstrap regains anyway."""
    from ..core import bootstrap as B

    cfg = setup.cfg
    ring = setup.params.ring_cipher
    I = public_preprocess(cfg, batch)
    keys = jax.random.split(rng, cfg.kernel * cfg.kernel)
    C = {}
    for i in range(cfg.kernel):
        for j in range(cfg.kernel):
            pt = F.make_plaintext(ring, I[i, j], setup.scale)
            C[(i, j)] = F.encrypt(setup.kp, pt, keys[i * cfg.kernel + j])

    w = np.asarray(model_params["conv_w"])
    bconv = np.asarray(model_params["conv_b"])
    conved = []
    for c in range(cfg.channels):
        acc = None
        for i in range(cfg.kernel):
            for j in range(cfg.kernel):
                term = F.mul_plain_scalar(C[(i, j)], float(w[i, j, c]))
                acc = term if acc is None else F.ct_add(acc, term)
        conved.append(F.ct_rescale(F.add_plain(acc, float(bconv[c]))))

    sqed1 = [F.ct_rescale(F.keyswitch(setup.ek, F.ct_mul(x, x)))
             for x in conved]

    w1 = np.asarray(model_params["w1"])
    d = cfg.positions
    fq1 = None
    for ci in range(cfg.channels):
        part = encrypted_matmul(setup, w1[:, ci * d:(ci + 1) * d], sqed1[ci])
        fq1 = part if fq1 is None else F.ct_add(fq1, part)
    fq1 = F.ct_rescale(F.add_plain(
        fq1, _rep_inner(np.asarray(model_params["b1"]), cfg.batch)))

    sqed2 = F.ct_rescale(F.keyswitch(setup.ek, F.ct_mul(fq1, fq1)))

    # normalize into EvalMod's range, exhaust to the base tower, then
    # refresh WITHOUT the secret key
    exhausted = F.ct_rescale(F.mul_plain_scalar(sqed2, 1.0 / prescale))
    if boot_ctx.scale_limbs > 1:
        # composite config: align to the refresh's exact (base limbs,
        # composite scale) target before exhausting (ckks_encoding.ct_to)
        from ..core import ckks_encoding as CE
        sl = boot_ctx.scale_limbs
        # the context records the exact base scale its EvalMod plan was
        # tuned for; fall back to the 26-bit-per-limb recipe only when
        # the context predates the field
        comp_scale = (Fraction(boot_ctx.base_scale)
                      if boot_ctx.base_scale is not None
                      else Fraction(2) ** (26 * sl))
        exhausted = CE.ct_to(exhausted, sl, comp_scale)
    else:
        while exhausted.ring.nlimbs > boot_ctx.scale_limbs:
            exhausted = F.ct_modswitch_drop(exhausted)
    # ``refresh_fn`` lets callers substitute a compiled refresh (the
    # trace_plain_cache + jit replay path, tools/bench_boot_mnist.py —
    # an eager N=2^13 refresh over a device tunnel is pathological)
    refreshed = (refresh_fn(exhausted) if refresh_fn is not None
                 else B.bootstrap(boot_ctx, exhausted))
    depth_out = refreshed.ring.nlimbs

    # dense2 at the REGAINED depth (prescale folded into the weights)
    w2 = np.asarray(model_params["w2"]) * prescale
    out = naive_rectangular_matmul(setup, w2, refreshed)
    b2pad = np.concatenate([np.asarray(model_params["b2"]),
                            np.zeros(d - cfg.classes)])
    out = F.add_plain(out, _rep_inner(b2pad, cfg.batch))

    dec = F.decrypt(setup.kp, out).real
    mat = dec.reshape(cfg.positions, cfg.batch)
    return mat[:cfg.classes, :], depth_out


def build_bootstrapped_pipeline(setup: FHESetup, boot_ctx, model_params,
                                prescale: float = 4.0, refresh_fn=None):
    """COMPILED bootstrapped pipeline (round-4 VERDICT item 3): the
    depth-unlimited flow

        conv → square → dense1 → square → BOOTSTRAP → dense2

    with every stage a jitted XLA program AT ITS TOWER LEVEL — the
    deep-tower (L=48/47/.../44) counterparts of the L=7 serving layers
    (parallel/layers.py: ConvLayer, SquareRelinLayer, RotateMatmulLayer
    under a fori_loop so compile cost is ONE keyswitch body, and the
    exhaust stage as one jit of the eager scale algebra), replacing the
    round-4 per-op eager dispatch (2,141 s wall at the reference shape).

    ``refresh_fn`` substitutes a compiled refresh (at production N the
    phased trace-replay, tools/bench_boot_mnist.py); default is
    ``jax.jit(bootstrap)``. The dense2 layer is built lazily at the
    refreshed tower level on first call.

    Iterated rotations (ONE galois key, d−1 sequential keyswitches per
    dense layer, infer.jl:141-150) — at deep towers a BSGS key set costs
    ~2√d · L·(L+1)·N·8 bytes (≫ 1 GB), so the single-key schedule is
    the memory-sound choice the round-4 full-shape run validated.

    Returns ``run(batch, rng) -> (logits [classes, B], depth_out)``.
    """
    from ..core import bootstrap as B
    from ..core import ckks_encoding as CE
    from ..core import ring as ringops
    from ..core.ckks_encoding import CKKSTag
    from ..ops import modmath as MM
    from ..parallel import layers as JL
    from ..parallel.ops import _mp_full, full_table_pytree

    cfg = setup.cfg
    params = setup.params
    ring0 = params.ring_cipher
    n = ring0.n
    s0 = setup.scale
    d = cfg.positions

    enc = JL.BatchEncryptor(params, setup.kp.pub, sigma=3.2)

    # ---- conv + bias + rescale at the full deep tower ----
    w = np.asarray(model_params["conv_w"])
    bconv = np.asarray(model_params["conv_b"])
    q0 = ring0.modulus
    wq = np.zeros((cfg.channels, cfg.kernel * cfg.kernel, ring0.nlimbs, 1),
                  dtype=np.uint32)
    for c in range(cfg.channels):
        for g in range(cfg.kernel * cfg.kernel):
            m = round(float(w.reshape(-1, cfg.channels)[g, c])
                      * float(s0)) % q0
            wq[c, g] = ring0.scalar_residues(m)
    s_conv = s0 * s0
    bias_dual = jnp.stack([
        ringops.ensure_dual(ring0, F.ckks_encode(
            ring0, np.full(n // 2, float(bconv[c]), dtype=complex),
            s_conv)).dual
        for c in range(cfg.channels)], 0)
    conv = JL.ConvLayer(params, ring0, cfg.channels)
    ring1 = ring0.drop_last()
    s1 = s_conv / ring0.primes[-1]

    # ---- square 1 (L0−1 tower) ----
    sq1 = JL.SquareRelinLayer(params, setup.ek, ring1)
    ring2 = ring1.drop_last()
    s2 = s1 * s1 / ring1.primes[-1]

    # ---- dense1: iterated-rotation diagonal matmul per channel ----
    w1 = np.asarray(model_params["w1"])
    mat1 = JL.RotateMatmulLayer(params, setup.gk,
                                setup.gk.galois_element, d, ring2)
    diags1 = []
    for ci in range(cfg.channels):
        blk = w1[:, ci * d:(ci + 1) * d]
        diags1.append(jnp.stack([
            ringops.ensure_dual(ring2, F.ckks_encode(
                ring2, _rep_inner(np.diag(np.roll(blk, k, axis=1)),
                                  cfg.batch).astype(complex), s2)).dual
            for k in range(d)], 0))
    mp2 = _mp_full(full_table_pytree(ring2.tables))
    s_fq1 = s2 * s2
    b1_dual = ringops.ensure_dual(ring2, F.ckks_encode(
        ring2, _rep_inner(np.asarray(model_params["b1"]), cfg.batch)
        .astype(complex), s_fq1)).dual
    br = JL.BiasRescaleLayer(ring2)
    ring3 = ring2.drop_last()
    s3 = s_fq1 / ring2.primes[-1]

    # ---- square 2 ----
    sq2 = JL.SquareRelinLayer(params, setup.ek, ring3)
    ring4 = ring3.drop_last()
    s4 = s3 * s3 / ring3.primes[-1]

    # ---- exhaust: one jit of the eager scale algebra ----
    sl = boot_ctx.scale_limbs
    comp_scale = (Fraction(boot_ctx.base_scale)
                  if boot_ctx.base_scale is not None
                  else Fraction(2) ** (26 * sl)) if sl > 1 else None

    def _exhaust(ct):
        ex = F.ct_rescale(CE.mul_plain_scalar(ct, 1.0 / prescale))
        if sl > 1:
            return CE.ct_to(ex, sl, comp_scale)
        while ex.ring.nlimbs > sl:
            ex = F.ct_modswitch_drop(ex)
        return ex

    exhaust = jax.jit(_exhaust)

    if refresh_fn is None:
        _jboot = jax.jit(B.bootstrap)
        refresh_fn = lambda c: _jboot(boot_ctx, c)

    # ---- dense2 at the REGAINED tower (built lazily: the refreshed
    # level is known only after the first refresh) ----
    w2 = np.asarray(model_params["w2"]) * prescale
    wpad2 = np.vstack([w2, np.zeros((d - w2.shape[0], d))])
    b2pad = np.concatenate([np.asarray(model_params["b2"]),
                            np.zeros(d - cfg.classes)])
    lazy2 = {}

    def dense2(refreshed):
        ringr = refreshed.ring
        sr = Fraction(refreshed.enc.scale)
        key = (ringr, sr)
        if lazy2.get("key") != key:
            lazy2["key"] = key
            lazy2["mat"] = JL.RotateMatmulLayer(
                params, setup.gk, setup.gk.galois_element, d, ringr)
            lazy2["diag"] = jnp.stack([
                ringops.ensure_dual(ringr, F.ckks_encode(
                    ringr, _rep_inner(np.diag(np.roll(wpad2, k, axis=1)),
                                      cfg.batch).astype(complex), sr)).dual
                for k in range(d)], 0)
            lazy2["b2"] = ringops.ensure_dual(ringr, F.ckks_encode(
                ringr, _rep_inner(b2pad, cfg.batch).astype(complex),
                sr * sr)).dual
            lazy2["mp"] = _mp_full(full_table_pytree(ringr.tables))
        c1p = ringops.ensure_primal(ringr, refreshed.cs[0]).primal
        c2p = ringops.ensure_primal(ringr, refreshed.cs[1]).primal
        r1, r2 = lazy2["mat"](c1p, c2p, lazy2["diag"])
        r1 = MM.add_mod(r1, lazy2["b2"], lazy2["mp"])
        return F.CipherText(params, (F.RingElt(dual=r1), F.RingElt(dual=r2)),
                            ringr, enc=CKKSTag(sr * sr))

    def run(batch: np.ndarray, rng):
        I = public_preprocess(cfg, batch)
        pts = np.stack([
            np.asarray(F.ckks_encode(ring0, I[i, j].astype(complex),
                                     s0).primal)
            for i in range(cfg.kernel) for j in range(cfg.kernel)], 0)
        cts = enc(jnp.asarray(pts), rng)              # (G, 2, L0, N) dual
        conv_out = conv(cts, jnp.asarray(wq), bias_dual)   # (C, 2, L1, N)
        o1, o2 = sq1(conv_out[:, 0], conv_out[:, 1])  # (C, L2, N) primal
        fq1_1 = fq1_2 = None
        for ci in range(cfg.channels):
            r1, r2 = mat1(o1[ci], o2[ci], diags1[ci])  # dual at s2²
            fq1_1 = r1 if fq1_1 is None else MM.add_mod(fq1_1, r1, mp2)
            fq1_2 = r2 if fq1_2 is None else MM.add_mod(fq1_2, r2, mp2)
        f1p, f2p = br(fq1_1, fq1_2, b1_dual)          # (L3, N) primal
        g1, g2 = sq2(f1p, f2p)                        # (L4, N) primal
        ct4 = F.CipherText(params, (F.RingElt(primal=g1),
                                    F.RingElt(primal=g2)),
                           ring4, enc=CKKSTag(s4))
        refreshed = refresh_fn(exhaust(ct4))
        depth_out = refreshed.ring.nlimbs
        out = dense2(refreshed)
        dec = F.decrypt(setup.kp, out).real
        mat = dec.reshape(cfg.positions, cfg.batch)
        return mat[:cfg.classes, :], depth_out

    return run


# ---------------------------------------------------------------------------
# jitted (serving-path) encrypted inference — same math, compiled layers
# ---------------------------------------------------------------------------

def build_inference_pipeline(setup: FHESetup, model_params, gks_bsgs=None,
                             dual_flow=None, mesh=None):
    """Build the compiled serving pipeline ONCE (layer jits, weight/diag
    encodings) and return ``run(batch, rng) -> logits``. Re-calling
    ``run`` reuses every compiled program — the warm path is the serving
    rate; the first call pays the Mosaic/XLA compiles.

    With ``gks_bsgs`` (from :func:`keygen_matmul_bsgs`) the dense layers
    compile the hoisted BSGS schedule instead of the d−1-keyswitch
    rotation loop: the whole engine-level BSGS matmul (rotate_many +
    lazy-ModDown rotate_sum) traces into ONE jit per dense layer, with
    the galois keys passed as pytree arguments (not HLO constants).

    ``dual_flow`` (round-3 VERDICT item 3): layer boundaries carry
    DUAL-domain ciphertexts end to end — conv and bias layers rescale in
    the dual domain (one-row INTT + L−1-row NTT instead of a full-tower
    INTT that the next layer immediately re-NTTs) and both square layers
    run the FUSED 61-transform contraction
    (``parallel.ops.make_hybrid_fused_step``: in-group digit reuse +
    dual-domain ModDown). Bit-identical to the primal flow. Default
    (None): auto-enabled for HybridRaised params with BSGS dense layers
    — the production serving configuration.

    ``mesh`` (SURVEY §7 stage 8 — the SHARDED serving pipeline): a
    ``jax.sharding.Mesh`` with axes ('dp', 'rp'). Inter-layer
    ciphertexts are committed to the mesh — the grid/channel axis on
    'dp' (ciphertext/batch parallelism, infer.jl:115-124's 49-ct grid)
    and the RNS limb axis on 'rp' (residue parallelism, crt.jl:247-275)
    — so every compiled layer (conv, fused squares, BSGS dense matmuls
    with hoisted rotate_many/rotate_sum, bias-rescales) partitions via
    XLA GSPMD, which inserts the collectives at the cross-limb sites
    (FBC digit gather, ModDown correction broadcast). All pipeline
    arithmetic is exact modular integer math and the reduction trees
    are sharding-invariant, so the sharded pipeline is BIT-IDENTICAL to
    the single-device one (asserted in tests/test_sharded_pipeline.py)."""
    from fractions import Fraction as Fr

    from ..core import ring as ringops
    from ..parallel import layers as JL

    cfg = setup.cfg
    params = setup.params
    if dual_flow is None:
        dual_flow = (getattr(params, "hybrid_decompose", None) is not None
                     and gks_bsgs is not None)
    if dual_flow and (getattr(params, "hybrid_decompose", None) is None
                      or gks_bsgs is None):
        raise ValueError("dual_flow requires HybridRaised params and "
                         "BSGS dense keys (gks_bsgs)")
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P

        def _place(x, *spec):
            # Shard an axis only when the mesh axis divides it: the RNS
            # tower shrinks at every rescale (L0, L0−1, ...), so 'rp'
            # applies at the levels it divides and the array stays
            # replicated over 'rp' elsewhere (still committed to the
            # mesh, SPMD over all devices; 'dp' carries the grid/channel
            # parallelism at every level). Plan limb counts divisible by
            # the rp extent when full residue parallelism is wanted.
            fixed = tuple(
                (s if s is not None and x.shape[i] % mesh.shape[s] == 0
                 else None)
                for i, s in enumerate(spec))
            return jax.device_put(x, NamedSharding(mesh, _P(*fixed)))
    else:
        def _place(x, *spec):
            return x
    ring0 = params.ring_cipher
    n = ring0.n
    s0 = setup.scale

    enc = JL.BatchEncryptor(params, setup.kp.pub, sigma=3.2)

    # ---- conv + bias + rescale (one jit) ----
    w = np.asarray(model_params["conv_w"])
    bconv = np.asarray(model_params["conv_b"])
    q0 = ring0.modulus
    wq = np.zeros((cfg.channels, cfg.kernel * cfg.kernel, ring0.nlimbs, 1),
                  dtype=np.uint32)
    for c in range(cfg.channels):
        for g in range(cfg.kernel * cfg.kernel):
            m = round(float(w.reshape(-1, cfg.channels)[g, c]) * float(s0)) % q0
            wq[c, g] = ring0.scalar_residues(m)
    s_conv = s0 * s0
    bias_dual = jnp.stack([
        ringops.ensure_dual(ring0, F.ckks_encode(
            ring0, np.full(n // 2, float(bconv[c]), dtype=complex), s_conv)).dual
        for c in range(cfg.channels)], 0)
    conv = JL.ConvLayer(params, ring0, cfg.channels, dual_out=dual_flow)
    ring1 = ring0.drop_last()
    s1 = s_conv / ring0.primes[-1]

    # ---- square 1 ----
    if dual_flow:
        from ..parallel import ops as pops
        sq1_fused, _ = pops.make_hybrid_fused_step(params, setup.ek, ring1)
    else:
        sq1 = JL.SquareRelinLayer(params, setup.ek, ring1)
    ring2 = ring1.drop_last()
    s2 = s1 * s1 / ring1.primes[-1]

    # ---- dense1: per-channel rotation matmuls, accumulated ----
    w1 = np.asarray(model_params["w1"])
    d = cfg.positions
    from ..ops import modmath as MM
    from ..parallel.ops import _mp_full, full_table_pytree
    mp2 = _mp_full(full_table_pytree(ring2.tables))
    if gks_bsgs is None:
        # iterated-rotation layer: d pre-encoded diagonals per channel
        mat1 = JL.RotateMatmulLayer(params, setup.gk,
                                    setup.gk.galois_element, d, ring2)
        diags1 = []
        for ci in range(cfg.channels):
            blk = w1[:, ci * d:(ci + 1) * d]
            diags1.append(jnp.stack([
                ringops.ensure_dual(ring2, F.ckks_encode(
                    ring2, _rep_inner(np.diag(np.roll(blk, k, axis=1)),
                                      cfg.batch).astype(complex), s2)).dual
                for k in range(d)], 0))
    else:
        from ..core import rlwe
        from ..core.ckks_encoding import CKKSTag

        # keys resident on device — host numpy pytree args would re-cross
        # the host↔device boundary every call (tens of MB on a tunnel).
        # Under a mesh the keys are committed REPLICATED (every shard
        # contracts against full key rows; GSPMD reshards if it prefers)
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _PS
            gks_bsgs = jax.device_put(gks_bsgs, NamedSharding(mesh, _PS()))
        else:
            gks_bsgs = jax.device_put(gks_bsgs)

        def _dense1_bsgs(o1, o2, gks_):
            mk = ((lambda x: F.RingElt(dual=x)) if dual_flow
                  else (lambda x: F.RingElt(primal=x)))
            cts = [F.CipherText(params, (mk(o1[ci]), mk(o2[ci])),
                                ring2, enc=CKKSTag(s2))
                   for ci in range(cfg.channels)]
            terms = _merge_bsgs_terms(
                [_bsgs_matmul_terms(setup, gks_,
                                    w1[:, ci * d:(ci + 1) * d], cts[ci])
                 for ci in range(cfg.channels)])
            if not terms:                       # all-zero weights
                out = _zero_product(cts[0])
            else:
                out = rlwe.rotate_sum(gks_, terms)
            return (ringops.ensure_dual(ring2, out.cs[0]).dual,
                    ringops.ensure_dual(ring2, out.cs[1]).dual)

        dense1_bsgs = jax.jit(_dense1_bsgs)
    s_fq1 = s2 * s2
    b1_dual = ringops.ensure_dual(ring2, F.ckks_encode(
        ring2, _rep_inner(np.asarray(model_params["b1"]), cfg.batch)
        .astype(complex), s_fq1)).dual
    br = JL.BiasRescaleLayer(ring2, dual_out=dual_flow)
    ring3 = ring2.drop_last()
    s3 = s_fq1 / ring2.primes[-1]

    # ---- square 2 ----
    if dual_flow:
        from ..parallel import ops as pops
        sq2_fused, _ = pops.make_hybrid_fused_step(params, setup.ek, ring3)
    else:
        sq2 = JL.SquareRelinLayer(params, setup.ek, ring3)
    ring4 = ring3.drop_last()
    s4 = s3 * s3 / ring3.primes[-1]

    # ---- dense2 (rectangular, zero-padded) ----
    w2 = np.asarray(model_params["w2"])
    wpad = np.vstack([w2, np.zeros((d - w2.shape[0], d))])
    mp4 = _mp_full(full_table_pytree(ring4.tables))
    if gks_bsgs is None:
        mat2 = JL.RotateMatmulLayer(params, setup.gk,
                                    setup.gk.galois_element, d, ring4)
        diag2 = jnp.stack([
            ringops.ensure_dual(ring4, F.ckks_encode(
                ring4, _rep_inner(np.diag(np.roll(wpad, k, axis=1)),
                                  cfg.batch).astype(complex), s4)).dual
            for k in range(d)], 0)
    else:
        from ..core.ckks_encoding import CKKSTag as _Tag

        def _dense2_bsgs(g1, g2, gks_):
            from ..core import rlwe
            mk = ((lambda x: F.RingElt(dual=x)) if dual_flow
                  else (lambda x: F.RingElt(primal=x)))
            ct = F.CipherText(params, (mk(g1), mk(g2)),
                              ring4, enc=_Tag(s4))
            terms = _bsgs_matmul_terms(setup, gks_, wpad, ct)
            out = (rlwe.rotate_sum(gks_, terms) if terms
                   else _zero_product(ct))
            return (ringops.ensure_dual(ring4, out.cs[0]).dual,
                    ringops.ensure_dual(ring4, out.cs[1]).dual)

        dense2_bsgs = jax.jit(_dense2_bsgs)
    s5 = s4 * s4
    b2pad = np.concatenate([np.asarray(model_params["b2"]),
                            np.zeros(d - cfg.classes)])
    b2_dual = ringops.ensure_dual(ring4, F.ckks_encode(
        ring4, _rep_inner(b2pad, cfg.batch).astype(complex), s5)).dual

    def run(batch: np.ndarray, rng, _return_ct: bool = False):
        # ---- per-request: encode inputs + batched encrypt (one jit) ----
        I = public_preprocess(cfg, batch)
        pts = np.stack([
            np.asarray(F.ckks_encode(ring0, I[i, j].astype(complex),
                                     s0).primal)
            for i in range(cfg.kernel) for j in range(cfg.kernel)], 0)
        cts = enc(jnp.asarray(pts), rng)              # (G, 2, L0, N) dual
        # mesh placements: grid/channel axis on 'dp', limb axis on 'rp';
        # each compiled layer partitions from its committed inputs (GSPMD)
        cts = _place(cts, "dp", None, "rp", None)
        conv_out = conv(cts, jnp.asarray(wq), bias_dual)
        conv_out = _place(conv_out, "dp", None, "rp", None)
        if dual_flow:
            # conv_out (C, 2, L1, N) DUAL; fused square keeps the tower
            # shape with the dropped limb zeroed — slice to ring2 rows
            sq1_out = sq1_fused(conv_out)[..., : ring2.nlimbs, :]
            o1, o2 = sq1_out[:, 0], sq1_out[:, 1]     # (C, L2, N) dual
        else:
            o1, o2 = sq1(conv_out[:, 0], conv_out[:, 1])  # primal
        o1 = _place(o1, "dp", "rp", None)
        o2 = _place(o2, "dp", "rp", None)
        if gks_bsgs is not None:
            fq1_1, fq1_2 = dense1_bsgs(o1, o2, gks_bsgs)
        else:
            fq1_1 = fq1_2 = None
            for ci in range(cfg.channels):
                r1, r2 = mat1(o1[ci], o2[ci], diags1[ci])  # dual at s2²
                fq1_1 = r1 if fq1_1 is None else MM.add_mod(fq1_1, r1, mp2)
                fq1_2 = r2 if fq1_2 is None else MM.add_mod(fq1_2, r2, mp2)
        fq1_1 = _place(fq1_1, "rp", None)
        fq1_2 = _place(fq1_2, "rp", None)
        f1p, f2p = br(fq1_1, fq1_2, b1_dual)          # (L3, N)
        if dual_flow:
            sq2_in = _place(jnp.stack([f1p, f2p], 0)[None],
                            None, None, "rp", None)
            sq2_out = sq2_fused(sq2_in)[0][..., : ring4.nlimbs, :]
            g1, g2 = sq2_out[0], sq2_out[1]           # (L4, N) dual
        else:
            g1, g2 = sq2(_place(f1p, "rp", None), _place(f2p, "rp", None))
        g1 = _place(g1, "rp", None)
        g2 = _place(g2, "rp", None)
        if gks_bsgs is not None:
            r1, r2 = dense2_bsgs(g1, g2, gks_bsgs)    # dual at s4²
        else:
            r1, r2 = mat2(g1, g2, diag2)              # dual at s4²
        r1 = MM.add_mod(r1, b2_dual, mp4)
        out = F.CipherText(params, (F.RingElt(dual=r1), F.RingElt(dual=r2)),
                           ring4, enc=F.CKKSTag(Fr(s5)))
        if _return_ct:
            # benchmark hook: the eager decrypt is host-side work (and
            # pathological over a TPU tunnel) — return the final logits
            # ciphertext instead so callers can time the compiled
            # pipeline alone and decrypt wherever they like
            return out
        dec = F.decrypt(setup.kp, out).real
        mat = dec.reshape(cfg.positions, cfg.batch)
        return mat[:cfg.classes, :]

    return run


def encrypted_inference_fast(setup: FHESetup, model_params,
                             batch: np.ndarray, rng, gks_bsgs=None,
                             dual_flow=None, mesh=None):
    """Encrypted forward pass using the compiled layers in
    parallel/layers.py (bit-exact vs the eager pipeline per layer).
    Returns the decrypted logits matrix [classes, B]. The built pipeline
    is cached on ``setup`` so repeat calls serve at warm rate. With
    ``mesh`` the pipeline runs SHARDED over ('dp', 'rp') — see
    :func:`build_inference_pipeline`."""
    pipe = getattr(setup, "_pipeline", None)
    prev = getattr(setup, "_pipeline_key", None)
    if (pipe is None or prev is None or prev[0] is not model_params
            or prev[1] is not gks_bsgs or prev[2:] != (dual_flow, mesh)):
        pipe = build_inference_pipeline(setup, model_params, gks_bsgs,
                                        dual_flow=dual_flow, mesh=mesh)
        setup._pipeline = pipe
        setup._pipeline_key = (model_params, gks_bsgs, dual_flow, mesh)
    return pipe(batch, rng)
