"""Trains the MC-CNN-fast matching network on the bundled MiddV2 GT.

The reference consumes offline MC-CNN volumes (``README.md:74-91``); this
closes BASELINE config 5 with REAL weights: a siamese hinge loss on cosine
similarities (the MC-CNN-fast training objective — positive pair at the GT
disparity, negative pair offset by a few pixels) over cones/teddy/venus,
holding out tsukuba for validation.

Writes ``localexpstereo_tpu/models/weights/mccnn_fast_v2.npz`` (a ~260 KB
pytree) and prints train/val hinge losses plus a matching-accuracy proxy.

Usage: python tools/train_mccnn.py [--steps 600] [--out PATH]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from localexpstereo_tpu.models import mccnn
from localexpstereo_tpu.utils import datasets

DATA = "/root/reference/data/MiddV2"
TRAIN = ("cones", "teddy", "venus")
HOLDOUT = "tsukuba"
MARGIN = 0.2
NEG_MIN, NEG_MAX = 4, 10


def load(name):
    pair = datasets.load_data(os.path.join(DATA, name), 0)
    gt = np.asarray(pair.disp_gt, np.float32)
    valid = np.isfinite(gt) & (gt > 0)
    return (jnp.asarray(pair.im0), jnp.asarray(pair.im1),
            jnp.asarray(gt), jnp.asarray(valid))


def hinge_loss(params, im0, im1, gt, valid, key, batch=4096):
    f0 = mccnn.features(params, im0)
    f1 = mccnn.features(params, im1)
    h, w = gt.shape
    kp, kn, ks = jax.random.split(key, 3)
    ys = jax.random.randint(kp, (batch,), 0, h)
    xs = jax.random.randint(jax.random.fold_in(kp, 1), (batch,), 0, w)
    d = jnp.rint(gt[ys, xs]).astype(jnp.int32)
    ok = valid[ys, xs] & (xs - d >= 0)

    off = jax.random.randint(kn, (batch,), NEG_MIN, NEG_MAX + 1)
    sign = jnp.where(jax.random.bernoulli(ks, 0.5, (batch,)), 1, -1)
    xneg = xs - d + off * sign
    ok &= (xneg >= 0) & (xneg < w)
    xpos = jnp.clip(xs - d, 0, w - 1)
    xneg = jnp.clip(xneg, 0, w - 1)

    fp = f0[ys, xs]
    s_pos = jnp.sum(fp * f1[ys, xpos], -1)
    s_neg = jnp.sum(fp * f1[ys, xneg], -1)
    hinge = jnp.maximum(0.0, MARGIN + s_neg - s_pos) * ok
    n = jnp.maximum(jnp.sum(ok), 1)
    return jnp.sum(hinge) / n, (jnp.sum((s_pos > s_neg) & ok) / n,)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "localexpstereo_tpu", "models", "weights", "mccnn_fast_v2.npz"))
    args = ap.parse_args()

    train = [load(n) for n in TRAIN]
    val = load(HOLDOUT)

    key = jax.random.PRNGKey(args.seed)
    params = mccnn.init_params(key)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, im0, im1, gt, valid, key):
        (loss, (acc,)), grads = jax.value_and_grad(
            hinge_loss, has_aux=True)(params, im0, im1, gt, valid, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    val_loss = jax.jit(lambda p, k: hinge_loss(p, *val, k))

    for it in range(args.steps):
        key, k = jax.random.split(key)
        im0, im1, gt, valid = train[it % len(train)]
        params, opt_state, loss, acc = step(params, opt_state, im0, im1,
                                            gt, valid, k)
        if it % 50 == 0 or it == args.steps - 1:
            vl, (vacc,) = val_loss(params, jax.random.fold_in(key, 999))
            print(f"step {it:4d}  train hinge {float(loss):.4f} "
                  f"acc {float(acc):.3f}   {HOLDOUT} hinge {float(vl):.4f} "
                  f"acc {float(vacc):.3f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    mccnn.save_params(args.out, params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
