"""RANSAC hypothesis-count A/B (VERDICT round-1 item 7).

The reference's MSAC adapts its sample count to the inlier ratio (conf 0.95,
cap 500; ``Proposer.h:243-271``); the TPU proposer evaluates a FIXED batch of
hypotheses in parallel. This experiment measures, on synthetic mixed-plane
cells at controlled inlier ratios, the probability that the fixed batch
recovers the majority plane (within the reference's inlier threshold 1.0)
and the residual quality of the refit — quantifying what 32 hypotheses give
up vs 64/128/256 and vs the reference's adaptive budget.

The adaptive count for inlier ratio w and sample size 3 is
``log(0.05) / log(1 - w^3)`` — e.g. w=0.5: 23, w=0.4: 45, w=0.3: 110.

Usage: python tools/ransac_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from localexpstereo_tpu.models import proposals
from localexpstereo_tpu.ops import plane as plane_ops


def make_cells(rng, n_cells, s, inlier_ratio, nd=60.0):
    """Cells whose per-pixel labels induce: majority plane (inlier_ratio of
    pixels), a second plane, and salt noise — the mixed-plane cells where
    RANSAC matters (object boundaries)."""
    labels = np.zeros((n_cells, s, s, 4), np.float32)
    true_abc = np.zeros((n_cells, 3), np.float32)
    for i in range(n_cells):
        a1, b1 = rng.uniform(-0.3, 0.3, 2)
        c1 = rng.uniform(5, nd - 5)
        a2, b2 = rng.uniform(-0.3, 0.3, 2)
        c2 = np.clip(c1 + rng.uniform(-15, 15), 0, nd)
        true_abc[i] = (a1, b1, c1)
        u = rng.random((s, s))
        which2 = u > inlier_ratio
        noise = u > 1 - (1 - inlier_ratio) * 0.3   # part of the minority
        ys, xs = np.mgrid[0:s, 0:s].astype(np.float32)
        d1 = a1 * xs + b1 * ys + c1
        d2 = a2 * xs + b2 * ys + c2
        d = np.where(which2, d2, d1)
        d = np.where(noise, rng.uniform(0, nd, (s, s)), d)
        # store as fronto-parallel per-pixel labels (a=b=0, c=d) — RANSAC
        # only reads the induced disparities.
        labels[i, :, :, 2] = d
        # majority-plane pixels keep the true slopes so disparity_at works
        labels[i, :, :, 0] = np.where(which2 | noise, 0, 0)
    return jnp.asarray(labels), true_abc


def run(num_h, labels, s):
    n = labels.shape[0]
    ox = jnp.zeros((n,), jnp.int32)
    oy = jnp.zeros((n,), jnp.int32)
    cw = jnp.full((n,), s, jnp.int32)
    ch = jnp.full((n,), s, jnp.int32)
    key = jax.random.PRNGKey(7)
    return proposals.ransac(key, labels, ox, oy, cw, ch,
                            num_hypotheses=num_h)


def main():
    rng = np.random.default_rng(0)
    s = 14                      # layer-0 cell size at halfH scale
    n_cells = 512
    print(f"{'inlier':>7} {'nhyp':>5} {'recovered%':>11} {'med|res|':>9}")
    for ratio in (0.7, 0.5, 0.4, 0.3):
        labels, true_abc = make_cells(rng, n_cells, s, ratio)
        ys, xs = np.mgrid[0:s, 0:s].astype(np.float32)
        for nh in (16, 32, 64, 128, 256):
            fits = np.asarray(run(nh, labels, s))
            d_fit = (fits[:, 0, None, None] * xs + fits[:, 1, None, None] * ys
                     + fits[:, 2, None, None])
            d_true = (true_abc[:, 0, None, None] * xs
                      + true_abc[:, 1, None, None] * ys
                      + true_abc[:, 2, None, None])
            res = np.abs(d_fit - d_true)
            recovered = (np.median(res.reshape(n_cells, -1), -1) < 1.0)
            print(f"{ratio:7.2f} {nh:5d} {100 * recovered.mean():10.1f}% "
                  f"{np.median(res):9.3f}")
        w = ratio
        adaptive = int(np.ceil(np.log(0.05) / np.log(1 - w ** 3)))
        print(f"        (reference adaptive count at w={w}: "
              f"{min(adaptive, 500)})")


if __name__ == "__main__":
    main()
