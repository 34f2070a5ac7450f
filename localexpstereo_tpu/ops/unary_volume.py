"""Cost-volume data term: plane-indexed sampling of a [D, H, W] volume.

TPU-native equivalent of ``CostVolumeEnergy::ComputeUnaryPotentialWithoutCheck``
(``CostVolumeEnergy.h:55-183``): for every window pixel the plane's disparity
``d = a*x + b*y + c`` indexes the volume's d-axis with linear interpolation
(``interpolate == 1``, the shipped default; nearest and quadratic variants are
also provided via ``method``). Instead of materializing per-region volume
slabs, the whole batch of windows is ONE flat gather from the HBM-resident
volume — two taps for linear interpolation.

Semantics preserved exactly:
- ``d < MIN``  -> slice 0;   ``d >= MAX`` -> slice D-1  (clamped, untruncated)
- NaN/Inf d    -> COST_FOR_INVALID
- result truncated at ``th_col`` (= mc_threshold, tau_CNN)
- windows are evaluated in GLOBAL pixel coordinates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import COST_FOR_INVALID


def sample_windows(vol: jnp.ndarray, proposals: jnp.ndarray,
                   ox: jnp.ndarray, oy: jnp.ndarray, size: int,
                   min_disp: float, max_disp: float, th_col: float,
                   method: int = 1) -> jnp.ndarray:
    """Samples raw unary costs for a batch of square windows.

    Args:
      vol: [D, H, W] float32 cost volume.
      proposals: [N, 4] plane labels.
      ox, oy: [N] int32 global coordinates of each window's top-left corner
        (may be negative / beyond the image; such pixels return 0 and are
        excluded by the in-image mask downstream).
      size: window side length F (static).
      method: 0 nearest, 1 linear (default), 2 quadratic
        (``CostVolumeEnergy.h:45-48``).
    Returns:
      [N, F, F] raw costs, already truncated at ``th_col``; 0 outside image.
    """
    d_, h, w = vol.shape
    flat = vol.reshape(-1)
    d0_off = int(-min_disp)  # reference D0 (CostVolumeEnergy.h:68)

    iy = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    ys = oy[:, None, None] + iy[None]          # [N, F, F] global int coords
    xs = ox[:, None, None] + ix[None]
    in_image = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    yc = jnp.clip(ys, 0, h - 1)
    xc = jnp.clip(xs, 0, w - 1)

    a = proposals[:, 0][:, None, None]
    b = proposals[:, 1][:, None, None]
    c = proposals[:, 2][:, None, None]
    d = a * xs.astype(jnp.float32) + b * ys.astype(jnp.float32) + c

    base = yc * w + xc  # [N, F, F] flat spatial index

    def tap(dslice):
        return flat[(dslice * (h * w) + base).reshape(-1)].reshape(base.shape)

    if method == 0:
        di = jnp.floor(d + 0.5).astype(jnp.int32) + d0_off
        cost = tap(jnp.clip(di, 0, d_ - 1))
        invalid = ~jnp.isfinite(d)
        cost = jnp.where(invalid, COST_FOR_INVALID, cost)
    elif method == 1:
        d_low = tap(jnp.zeros_like(base))
        d_high = tap(jnp.full_like(base, d_ - 1))
        df = jnp.floor(d)
        dd0 = df.astype(jnp.int32) + d0_off
        f1 = d - df
        c0 = tap(jnp.clip(dd0, 0, d_ - 1))
        c1 = tap(jnp.clip(dd0 + 1, 0, d_ - 1))
        lin = (1.0 - f1) * c0 + f1 * c1
        # Out-of-range d0/d1 -> COST_FOR_INVALID (CostVolumeEnergy.h:88-92).
        lin = jnp.where((dd0 < 0) | (dd0 + 1 >= d_), COST_FOR_INVALID, lin)
        cost = jnp.where(d < min_disp, d_low,
                         jnp.where(d >= max_disp, d_high, lin))
        cost = jnp.where(~jnp.isfinite(d), COST_FOR_INVALID, cost)
    elif method == 2:
        di = jnp.clip(jnp.floor(d + 0.5).astype(jnp.int32) + d0_off, 0, d_ - 1)
        d1i = jnp.maximum(di - 1, 0)
        d3i = jnp.minimum(di + 1, d_ - 1)
        y1, y2, y3 = tap(d1i), tap(di), tap(d3i)
        rd1 = d1i.astype(jnp.float32)
        rd2 = di.astype(jnp.float32)
        rd3 = d3i.astype(jnp.float32)
        # Lagrange quadratic through (d1,y1),(d2,y2),(d3,y3); degenerate
        # (equal abscissae at volume edges) produces inf/NaN like the
        # reference and is clamped by the d-range branches below.
        qa = y1 / (rd1 - rd2) / (rd1 - rd3)
        qb = y2 / (rd2 - rd1) / (rd2 - rd3)
        qc = y3 / (rd3 - rd1) / (rd3 - rd2)
        r = qa + qb + qc
        p = -(qa * (rd2 + rd3) + qb * (rd1 + rd3) + qc * (rd1 + rd2))
        q = qa * rd2 * rd3 + qb * rd1 * rd3 + qc * rd1 * rd2
        dv = d + float(d0_off)
        quad = r * dv * dv + p * dv + q
        cost = jnp.where(jnp.floor(d + 0.5) + d0_off < 0, tap(jnp.zeros_like(base)),
                         jnp.where(jnp.floor(d + 0.5) + d0_off >= d_,
                                   tap(jnp.full_like(base, d_ - 1)), quad))
        cost = jnp.where(~jnp.isfinite(d), COST_FOR_INVALID, cost)
    else:
        raise ValueError(f"unknown interpolation method {method}")

    cost = jnp.minimum(cost, th_col)
    return jnp.where(in_image, cost, 0.0).astype(jnp.float32)
