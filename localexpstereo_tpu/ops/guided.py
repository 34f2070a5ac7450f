"""Guided image filter (He et al.) with global-statistics reuse.

Matches the reference's ``GuidedImageFilter`` / ``FastGuidedImageFilter``
(``GuidedFilter.h:58-326``): the guide statistics (per-pixel channel means and
the 6 distinct entries of the regularized inverse covariance) are computed
ONCE per view on the full image; per-region filtering then only needs box
sums of the cost and cost-times-guide — the trick that halved the reference's
runtime (``README.md:68``) and that maps naturally onto TPU as: stats resident
in HBM, window slices + banded-matmul box sums in VMEM/MXU.

Boundary semantics are the reference's: zero padding with true-count
normalization ``N`` (``GuidedFilter.h:272-281``), where the count is taken
over the *clipped* filter region (crop boundary = image boundary); here that
is expressed with an in-image mask so windows keep static shapes.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import boxfilter


class GuidedFilterStats(NamedTuple):
    """Global per-pixel guide statistics (all [H, W, k], float32)."""

    guide: jnp.ndarray    # [H, W, 3] scaled guide (I * 1/255)
    mean: jnp.ndarray     # [H, W, 3] windowed channel means
    inv: jnp.ndarray      # [H, W, 6] inverse covariance (rr, rg, rb, gg, gb, bb)


def compute_stats(image: np.ndarray, radius: int, eps: float,
                  scaling: float = 1.0 / 255.0) -> GuidedFilterStats:
    """Computes global guide statistics in float64 on host (the reference's
    shipped "GF" variant also runs in double; ``StereoEnergy.h:673-681``).

    Args:
      image: [H, W, 3] float 0..255.
    """
    I = np.asarray(image, np.float64) * scaling
    ones = np.ones(I.shape[:2], np.float64)
    n = _np_boxsum(ones, radius)
    mean = np.stack([_np_boxsum(I[..., c], radius) / n for c in range(3)], -1)
    var = {}
    pairs = [("rr", 0, 0), ("rg", 0, 1), ("rb", 0, 2), ("gg", 1, 1),
             ("gb", 1, 2), ("bb", 2, 2)]
    for name, i, j in pairs:
        v = _np_boxsum(I[..., i] * I[..., j], radius) / n \
            - mean[..., i] * mean[..., j]
        if i == j:
            v = v + eps
        var[name] = v
    inv_rr = var["gg"] * var["bb"] - var["gb"] * var["gb"]
    inv_rg = var["gb"] * var["rb"] - var["rg"] * var["bb"]
    inv_rb = var["rg"] * var["gb"] - var["gg"] * var["rb"]
    inv_gg = var["rr"] * var["bb"] - var["rb"] * var["rb"]
    inv_gb = var["rb"] * var["rg"] - var["rr"] * var["gb"]
    inv_bb = var["rr"] * var["gg"] - var["rg"] * var["rg"]
    det = inv_rr * var["rr"] + inv_rg * var["rg"] + inv_rb * var["rb"]
    inv = np.stack([inv_rr, inv_rg, inv_rb, inv_gg, inv_gb, inv_bb],
                   -1) / det[..., None]
    return GuidedFilterStats(
        guide=jnp.asarray(I, jnp.float32),
        mean=jnp.asarray(mean, jnp.float32),
        inv=jnp.asarray(inv, jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("radius",))
def compute_stats_device(image: jnp.ndarray, radius: int, eps: float,
                         scaling: float = 1.0 / 255.0) -> GuidedFilterStats:
    """On-device float32 variant of :func:`compute_stats` (same math).

    The host path runs in float64 for reference parity
    (``StereoEnergy.h:673-681``); this one trades that for zero host work
    and zero host->device stats traffic — the serving path's per-frame
    budget (``serving.StereoStream``). f32 vs f64 stats shift unary costs
    by O(1e-6), far below the move-acceptance noise floor.
    """
    I = jnp.asarray(image, jnp.float32) * scaling
    ones = jnp.ones(I.shape[:2], jnp.float32)
    n = boxfilter.boxsum2d(ones, radius)
    mean = boxfilter.boxsum2d(jnp.moveaxis(I, -1, 0), radius) / n
    pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    var = []
    for k, (i, j) in enumerate(pairs):
        v = boxfilter.boxsum2d(I[..., i] * I[..., j], radius) / n \
            - mean[i] * mean[j]
        var.append(v + eps if i == j else v)
    rr, rg, rb, gg, gb, bb = var
    inv_rr = gg * bb - gb * gb
    inv_rg = gb * rb - rg * bb
    inv_rb = rg * gb - gg * rb
    inv_gg = rr * bb - rb * rb
    inv_gb = rb * rg - rr * gb
    inv_bb = rr * gg - rg * rg
    det = inv_rr * rr + inv_rg * rg + inv_rb * rb
    inv = jnp.stack([inv_rr, inv_rg, inv_rb, inv_gg, inv_gb, inv_bb],
                    -1) / det[..., None]
    return GuidedFilterStats(guide=I, mean=jnp.moveaxis(mean, 0, -1),
                             inv=jnp.nan_to_num(inv))


def _np_boxsum(x: np.ndarray, radius: int) -> np.ndarray:
    """Zero-padded (2R+1)^2 box sum via summed-area table (host, float64)."""
    h, w = x.shape
    sat = np.zeros((h + 1, w + 1), np.float64)
    sat[1:, 1:] = np.cumsum(np.cumsum(x, 0), 1)
    ys = np.arange(h)
    xs = np.arange(w)
    y0 = np.clip(ys - radius, 0, h)
    y1 = np.clip(ys + radius + 1, 0, h)
    x0 = np.clip(xs - radius, 0, w)
    x1 = np.clip(xs + radius + 1, 0, w)
    return (sat[y1[:, None], x1[None, :]] - sat[y0[:, None], x1[None, :]]
            - sat[y1[:, None], x0[None, :]] + sat[y0[:, None], x0[None, :]])


@functools.partial(jax.jit, static_argnames=("radius",))
def filter_windows(p: jnp.ndarray, guide: jnp.ndarray, mean: jnp.ndarray,
                   inv: jnp.ndarray, mask: jnp.ndarray,
                   radius: int) -> jnp.ndarray:
    """Guided-filters a batch of cost windows with precomputed global stats.

    This reproduces ``FastGuidedImageFilter::createSubregionFilter`` +
    ``filter_raw`` (``GuidedFilter.h:142-247,301-326``): global means /
    inverse covariances are *sliced*, only the box sums of p and p*I and the
    count N are window-local. Out-of-image window positions (mask == 0)
    contribute nothing and produce zeros.

    Args:
      p: [N, F, F] raw costs (any values at mask==0 positions are ignored).
      guide: [N, F, F, 3] scaled guide windows.
      mean: [N, F, F, 3]; inv: [N, F, F, 6]; mask: [N, F, F] (1 in-image).
    Returns:
      [N, F, F] filtered costs (valid at positions whose box window lies
      within the in-image part, i.e. the shared-region interior).
    """
    mask = mask.astype(p.dtype)
    p0 = p * mask
    n = boxfilter.boxsum2d(mask, radius)
    inv_n = 1.0 / jnp.maximum(n, 1e-8)

    gi = jnp.moveaxis(guide, -1, 1)                      # [N, 3, F, F]
    stacked = jnp.concatenate([p0[:, None], p0[:, None] * gi], axis=1)
    sums = boxfilter.boxsum2d(stacked, radius)           # [N, 4, F, F]
    mean_p = sums[:, 0] * inv_n
    cov = (sums[:, 1:] * inv_n[:, None]
           - jnp.moveaxis(mean, -1, 1) * mean_p[:, None])

    ir, ig, ib = cov[:, 0], cov[:, 1], cov[:, 2]
    a_r = inv[..., 0] * ir + inv[..., 1] * ig + inv[..., 2] * ib
    a_g = inv[..., 1] * ir + inv[..., 3] * ig + inv[..., 4] * ib
    a_b = inv[..., 2] * ir + inv[..., 4] * ig + inv[..., 5] * ib
    b = (mean_p - a_r * mean[..., 0] - a_g * mean[..., 1]
         - a_b * mean[..., 2])

    ab = jnp.stack([a_r * mask, a_g * mask, a_b * mask, b * mask], axis=1)
    ab_sums = boxfilter.boxsum2d(ab, radius)             # [N, 4, F, F]
    q = (ab_sums[:, 0] * guide[..., 0] + ab_sums[:, 1] * guide[..., 1]
         + ab_sums[:, 2] * guide[..., 2] + ab_sums[:, 3]) * inv_n
    return q


def filter_image(p: jnp.ndarray, stats: GuidedFilterStats,
                 radius: int) -> jnp.ndarray:
    """Whole-image guided filtering (reference ``filter_mat`` semantics)."""
    mask = jnp.ones(p.shape, p.dtype)
    return filter_windows(p[None], stats.guide[None], stats.mean[None],
                          stats.inv[None], mask[None], radius)[0]
