"""Cost-volume data term: plane-indexed sampling of a [D, H, W] volume.

TPU-native equivalent of ``CostVolumeEnergy::ComputeUnaryPotentialWithoutCheck``
(``CostVolumeEnergy.h:55-183``): for every window pixel the plane's disparity
``d = a*x + b*y + c`` indexes the volume's d-axis with linear interpolation
(``interpolate == 1``, the shipped default; nearest and quadratic variants are
also provided via ``method``).

Two implementations:
- :func:`sample_windows_slab` (fast path, linear only): per-region contiguous
  volume slabs + dense tent-weight reduction — streams at HBM bandwidth
  instead of paying per-element gather latency (~20x faster on TPU);
- :func:`sample_windows` (reference-exact gather formulation, all three
  interpolation modes) — kept as the oracle and for methods 0/2.

Semantics preserved exactly:
- ``d < MIN``  -> slice 0;   ``d >= MAX`` -> slice D-1  (clamped, untruncated)
- NaN/Inf d    -> COST_FOR_INVALID
- result truncated at ``th_col`` (= mc_threshold, tau_CNN)
- windows are evaluated in GLOBAL pixel coordinates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import COST_FOR_INVALID
from . import windows as windows_mod


def _decode(cost: jnp.ndarray, scale: float, zero: float) -> jnp.ndarray:
    """Dequantizes contracted costs from a quantized volume (uint8 storage,
    ``EnergyConfig.vol_scale/vol_zero``). The tent/linear contraction is
    linear in the slab values and the tent weights sum to 1, so decoding
    AFTER the reduction is exact: ``sum(tent*(q*s+z)) == s*sum(tent*q)+z``.
    Static no-op (identity graph) for unquantized volumes."""
    if scale == 1.0 and zero == 0.0:
        return cost
    return cost * scale + zero


def sample_windows_slab(vol: jnp.ndarray, proposals: jnp.ndarray,
                        ox: jnp.ndarray, oy: jnp.ndarray, size: int,
                        min_disp: float, max_disp: float,
                        th_col: float,
                        budget_bytes: int = 2 << 30,
                        scale: float = 1.0,
                        zero: float = 0.0) -> jnp.ndarray:
    """Linear-interpolation sampling via per-region volume slabs (fast path).

    Per-pixel gathers are index-rate-bound on TPU (~100x slower than
    streaming); instead each region DMAs its contiguous [D, F, F] spatial
    slab once and reduces over d with an exact tent weight
    ``max(0, 1 - |d_grid - d(x, y)|)``, which reproduces the reference's
    linear interpolation INCLUDING the clamp-to-end-slices behavior for
    out-of-range disparities (``CostVolumeEnergy.h:69-98``): clipping
    ``d + D0`` to [0, D-1] makes the tent hit slice 0 / slice D-1 exactly.

    Windows are sliced at CLAMPED origins (so the slab always covers the
    in-image part) and shifted back to window coordinates afterwards.
    """
    d_, h, w = vol.shape
    n = proposals.shape[0]

    # Chunk the region batch so the slab transient stays under the budget
    # (the init path evaluates every cell of the image at once; the batched
    # solver divides the budget by its per-device pair count). Account for
    # XLA's (8, 128) tile padding of the trailing [F, F] dims — the
    # physical allocation is ~5x the logical bytes at typical window sizes.
    per_region = d_ * (-(-size // 8) * 8) * (-(-size // 128) * 128) * 4
    chunk = max(1, min(n, budget_bytes // max(per_region, 1)))
    if chunk < n:
        n_pad = -(-n // chunk) * chunk
        pads = n_pad - n

        def padv(x):
            return jnp.pad(x, [(0, pads)] + [(0, 0)] * (x.ndim - 1))

        out = jax.lax.map(
            lambda args: _slab_chunk(vol, *args, size=size,
                                     min_disp=min_disp, th_col=th_col,
                                     scale=scale, zero=zero),
            (padv(proposals).reshape(-1, chunk, 4),
             padv(ox).reshape(-1, chunk), padv(oy).reshape(-1, chunk)))
        return out.reshape(n_pad, size, size)[:n]
    return _slab_chunk(vol, proposals, ox, oy, size=size, min_disp=min_disp,
                       th_col=th_col, scale=scale, zero=zero)


def slice_slabs(vol: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                size: int):
    """Pre-slices per-region volume slabs at clamped origins.

    Proposal-independent: the engine hoists this out of its per-proposal
    loop so 9 proposals share one slab read. Returns (slab, ocx, ocy)."""
    d_, h, w = vol.shape
    ocx = jnp.clip(ox, 0, max(w - size, 0))
    ocy = jnp.clip(oy, 0, max(h - size, 0))

    def slice_slab(o):
        return jax.lax.dynamic_slice(vol, (0, o[1], o[0]), (d_, size, size))

    slab = jax.vmap(slice_slab)(jnp.stack([ocx, ocy], -1))  # [N, D, F, F]
    return slab, ocx, ocy


def sample_slabs(slab, ocx, ocy, proposals, ox, oy, hw, *, size, min_disp,
                 th_col, scale=1.0, zero=0.0):
    """Tent-weight reduction over pre-sliced slabs (see sample_windows_slab)."""
    h, w = hw
    d_ = slab.shape[1]
    d0_off = float(-min_disp)

    iy = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
    ix = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)
    xs = ocx[:, None, None].astype(jnp.float32) + ix[None]
    ys = ocy[:, None, None].astype(jnp.float32) + iy[None]
    a = proposals[:, 0][:, None, None]
    b = proposals[:, 1][:, None, None]
    c = proposals[:, 2][:, None, None]
    d = a * xs + b * ys + c
    dv = jnp.clip(d + d0_off, 0.0, float(d_ - 1))

    dgrid = jax.lax.broadcasted_iota(jnp.float32, (d_, 1, 1), 0)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(dgrid[None] - dv[:, None]))
    cost = jnp.sum(slab.astype(jnp.float32) * tent, axis=1)
    cost = _decode(cost, scale, zero)
    cost = jnp.where(jnp.isfinite(d), cost, COST_FOR_INVALID)
    cost = jnp.minimum(cost, th_col)

    # Shift from slab coordinates back to the requested window coordinates
    # (|origin - clamped origin| < size by the window geometry).
    cost_p = jnp.pad(cost, ((0, 0), (size, size), (size, size)))
    offx = (ox - ocx) + size
    offy = (oy - ocy) + size

    def shift_one(args):
        cp, oyx = args
        return jax.lax.dynamic_slice(cp, (oyx[1], oyx[0]), (size, size))

    cost = jax.vmap(shift_one)((cost_p, jnp.stack([offx, offy], -1)))

    iyg = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    ixg = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    ysg = oy[:, None, None] + iyg[None]
    xsg = ox[:, None, None] + ixg[None]
    in_image = (xsg >= 0) & (xsg < w) & (ysg >= 0) & (ysg < h)
    return jnp.where(in_image, cost, 0.0).astype(jnp.float32)


def sample_slabs_aligned(slab, proposals, fox, foy, height, width, *,
                         min_disp, th_col, scale=1.0, zero=0.0):
    """Tent-weight reduction over ALIGNED slabs.

    Unlike :func:`sample_slabs`, the slab's (0, 0) pixel sits exactly at the
    window origin (fox, foy) — possible origins outside the image read the
    padded volume's zero margin, whose values are don't-care because the
    in-image mask zeroes them here and the guided filter's fmask excludes
    them from aggregation. Avoids the per-region realignment slice.

    Args:
      slab: [N, D, F, F] volume slabs (any float dtype; compute is f32).
      proposals: [N, 4]; fox, foy: [N] window origins (global, may be < 0).
    """
    n, d_, size = slab.shape[0], slab.shape[1], slab.shape[2]
    d0_off = float(-min_disp)
    iy = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
    ix = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)
    xs = fox[:, None, None].astype(jnp.float32) + ix[None]
    ys = foy[:, None, None].astype(jnp.float32) + iy[None]
    a = proposals[:, 0][:, None, None]
    b = proposals[:, 1][:, None, None]
    c = proposals[:, 2][:, None, None]
    d = a * xs + b * ys + c
    dv = jnp.clip(d + d0_off, 0.0, float(d_ - 1))

    dgrid = jax.lax.broadcasted_iota(jnp.float32, (d_, 1, 1), 0)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(dgrid[None] - dv[:, None]))
    cost = jnp.sum(slab.astype(jnp.float32) * tent, axis=1)
    cost = _decode(cost, scale, zero)
    cost = jnp.where(jnp.isfinite(d), cost, COST_FOR_INVALID)
    cost = jnp.minimum(cost, th_col)

    in_image = ((xs >= 0) & (xs < width) & (ys >= 0) & (ys < height))
    return jnp.where(in_image, cost, 0.0).astype(jnp.float32)


def sample_block_aligned(parts, proposals, fox0, foy0, nby: int, nbx: int,
                         t: int, f: int, height, width, *,
                         min_disp, th_col, scale=1.0, zero=0.0):
    """Tent-weight reduction computed BLOCK-MAJOR over a regular color grid.

    Same per-pixel math as :func:`sample_slabs_aligned` (bit-identical
    element order: the D reduction runs in increasing d either way), but
    evaluated on the un-exploded bounding block of the color's windows
    (``ops.windows.dense_block_parts``) instead of [N, D, F, F] slabs:

    - no (F/T)^2 window duplication of the D axis (1.26x at the fine
      layer, where F = 3s + 2r = 62 vs stride T = 4s = 56);
    - the minor dim is the block width (~11+ lane tiles, ~95% fill)
      instead of F = 62 (48% fill) — the tent contraction is VPU-bound,
      so lane fill is wall-clock;
    - the per-color hoist shrinks from an [N, D, F, F] explosion (~20 ms
      at the fine layer) to one ``dynamic_slice`` + reshape strips.

    Overlap pixels (F > T) appear in ``parts`` under both owners' plane
    proposals; ``assemble_window_quadrants`` stitches the per-part results
    into [N, F, F] windows.

    Args:
      parts: (main, rows, cols, corner) from ``dense_block_parts`` on the
        padded volume.
      proposals: [N = nby * nbx, 4] planes, row-major over the color grid.
      fox0, foy0: window (0, 0)'s filter origin in GLOBAL image coords
        (traced int scalars); window (m, k)'s origin is (fox0 + k * T,
        foy0 + m * T) by grid regularity (the module premise of
        ``ops.windows``).
    """
    main, rows, cols, corner = parts
    d_ = main.shape[0]
    e = f - t
    ag = proposals[:, 0].reshape(nby, nbx)
    bg = proposals[:, 1].reshape(nby, nbx)
    cg = proposals[:, 2].reshape(nby, nbx)
    d0_off = float(-min_disp)
    dgrid = jax.lax.broadcasted_iota(jnp.float32, (d_, 1, 1), 0)

    def tent_part(vol, owner_rep, xs_i, ys_i):
        ry, rx = owner_rep
        av = jnp.repeat(jnp.repeat(ag, ry, 0), rx, 1)
        bv = jnp.repeat(jnp.repeat(bg, ry, 0), rx, 1)
        cv = jnp.repeat(jnp.repeat(cg, ry, 0), rx, 1)
        h_, w_ = vol.shape[1], vol.shape[2]
        av, bv, cv = av[:h_, :w_], bv[:h_, :w_], cv[:h_, :w_]
        xs = (fox0 + xs_i).astype(jnp.float32)[None, :]
        ys = (foy0 + ys_i).astype(jnp.float32)[:, None]
        d = av * xs + bv * ys + cv
        dv = jnp.clip(d + d0_off, 0.0, float(d_ - 1))
        tent = jnp.maximum(0.0, 1.0 - jnp.abs(dgrid - dv[None]))
        cost = jnp.sum(vol.astype(jnp.float32) * tent, axis=0)
        cost = _decode(cost, scale, zero)
        cost = jnp.where(jnp.isfinite(d), cost, COST_FOR_INVALID)
        cost = jnp.minimum(cost, th_col)
        in_image = ((xs >= 0) & (xs < width) & (ys >= 0) & (ys < height))
        return jnp.where(in_image, cost, 0.0).astype(jnp.float32)

    def tail_idx(n):
        # Row/col index of tail pixel u of tile j + 1: (j + 1) * T + u.
        i = jnp.arange(n * e, dtype=jnp.int32)
        return (i // e + 1) * t + i % e

    def body_idx(m):
        return jnp.arange(m, dtype=jnp.int32)

    c_main = tent_part(main, (t, t),
                       body_idx(main.shape[2]), body_idx(main.shape[1]))
    if e <= 0:
        return windows_mod.assemble_window_quadrants(
            c_main, None, None, None, nby, nbx, t, f)
    c_rows = tent_part(rows, (e, t), body_idx(nbx * t), tail_idx(nby))
    c_cols = tent_part(cols, (t, e), tail_idx(nbx), body_idx(nby * t))
    c_cor = tent_part(corner, (e, e), tail_idx(nbx), tail_idx(nby))
    return windows_mod.assemble_window_quadrants(
        c_main, c_rows, c_cols, c_cor, nby, nbx, t, f)


def sample_slabs_method(slab: jnp.ndarray, proposals: jnp.ndarray,
                        fox: jnp.ndarray, foy: jnp.ndarray, height, width, *,
                        min_disp, max_disp, th_col, method: int,
                        scale: float = 1.0, zero: float = 0.0):
    """All three interpolation modes over ALIGNED slabs.

    Bit-identical element math to :func:`sample_windows` (the gather
    oracle, ``CostVolumeEnergy.h:69-118``) but the d-taps read the region's
    pre-sliced [N, D, F, F] slab via ``take_along_axis`` instead of
    gathering from the full volume — this is what lets the spatially
    sharded engine (``parallel/volume.py``), whose devices hold only their
    overlapped volume rows, run the nearest/quadratic modes too (lifting
    the former interp==1 restriction). Linear mode stays on the faster
    tent contraction (:func:`sample_slabs_aligned`); this path serves
    methods 0 and 2 (and is oracle-tested for 1 as well).
    """
    n, d_, size = slab.shape[0], slab.shape[1], slab.shape[2]
    d0_off = int(-min_disp)
    iy = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    xs = fox[:, None, None] + ix[None]
    ys = foy[:, None, None] + iy[None]
    in_image = (xs >= 0) & (xs < width) & (ys >= 0) & (ys < height)

    a = proposals[:, 0][:, None, None]
    b = proposals[:, 1][:, None, None]
    c = proposals[:, 2][:, None, None]
    d = a * xs.astype(jnp.float32) + b * ys.astype(jnp.float32) + c

    def tap(dslice):
        v = jnp.take_along_axis(slab, dslice[:, None], axis=1)[:, 0]
        return _decode(v.astype(jnp.float32), scale, zero)

    zeros_i = jnp.zeros((n, size, size), jnp.int32)
    if method == 0:
        di = jnp.floor(d + 0.5).astype(jnp.int32) + d0_off
        cost = tap(jnp.clip(di, 0, d_ - 1))
        cost = jnp.where(~jnp.isfinite(d), COST_FOR_INVALID, cost)
    elif method == 1:
        d_low = tap(zeros_i)
        d_high = tap(jnp.full_like(zeros_i, d_ - 1))
        df = jnp.floor(d)
        dd0 = df.astype(jnp.int32) + d0_off
        f1 = d - df
        c0 = tap(jnp.clip(dd0, 0, d_ - 1))
        c1 = tap(jnp.clip(dd0 + 1, 0, d_ - 1))
        lin = (1.0 - f1) * c0 + f1 * c1
        lin = jnp.where((dd0 < 0) | (dd0 + 1 >= d_), COST_FOR_INVALID, lin)
        cost = jnp.where(d < min_disp, d_low,
                         jnp.where(d >= max_disp, d_high, lin))
        cost = jnp.where(~jnp.isfinite(d), COST_FOR_INVALID, cost)
    elif method == 2:
        di = jnp.clip(jnp.floor(d + 0.5).astype(jnp.int32) + d0_off,
                      0, d_ - 1)
        d1i = jnp.maximum(di - 1, 0)
        d3i = jnp.minimum(di + 1, d_ - 1)
        y1, y2, y3 = tap(d1i), tap(di), tap(d3i)
        rd1 = d1i.astype(jnp.float32)
        rd2 = di.astype(jnp.float32)
        rd3 = d3i.astype(jnp.float32)
        qa = y1 / (rd1 - rd2) / (rd1 - rd3)
        qb = y2 / (rd2 - rd1) / (rd2 - rd3)
        qc = y3 / (rd3 - rd1) / (rd3 - rd2)
        r = qa + qb + qc
        p = -(qa * (rd2 + rd3) + qb * (rd1 + rd3) + qc * (rd1 + rd2))
        q = qa * rd2 * rd3 + qb * rd1 * rd3 + qc * rd1 * rd2
        dv = d + float(d0_off)
        quad = r * dv * dv + p * dv + q
        cost = jnp.where(jnp.floor(d + 0.5) + d0_off < 0, tap(zeros_i),
                         jnp.where(jnp.floor(d + 0.5) + d0_off >= d_,
                                   tap(jnp.full_like(zeros_i, d_ - 1)),
                                   quad))
        cost = jnp.where(~jnp.isfinite(d), COST_FOR_INVALID, cost)
    else:
        raise ValueError(f"unknown interpolation method {method}")

    cost = jnp.minimum(cost, th_col)
    return jnp.where(in_image, cost, 0.0).astype(jnp.float32)


def sample_slabs_dshard(slab: jnp.ndarray, proposals: jnp.ndarray,
                        fox: jnp.ndarray, foy: jnp.ndarray, height, width, *,
                        min_disp, max_disp, th_col, method: int,
                        d_base, d_owned, d_total: int,
                        scale: float = 1.0, zero: float = 0.0):
    """Per-device PARTIAL of the slab sampling over a D-SHARDED volume.

    The disparity axis is split across a mesh (``parallel/dvolume.py``):
    this device's local slab plane ``j`` holds GLOBAL plane
    ``d_base - 1 + j`` — the owned planes ``[d_base, d_base + d_owned)``
    plus one halo plane on each side (zero-padded at the volume ends; the
    halo planes are only ever read as the secondary taps of owned pixels).

    Every output pixel is assigned exactly ONE owner device — the holder of
    its primary interpolation tap (``floor`` of the clipped plane disparity;
    the out-of-range and non-finite branches go to the end/first devices) —
    and the owner computes the pixel's fully FINALIZED cost (decode,
    invalid-replace, ``th_col`` truncation, in-image zeroing) from planes
    that are all local to it. Non-owned pixels contribute exact zeros, so a
    ``psum`` over the mesh axis reassembles the unsharded result
    bit-for-bit (:func:`sample_slabs_aligned` for linear,
    :func:`sample_slabs_method` for nearest/quadratic): the unsharded
    reductions differ only by added exact zeros / identical two-term sums.

    Args:
      slab: [N, DL, F, F] local slabs (DL = d_owned_max + 2).
      d_base, d_owned: traced per-device scalars (global first owned plane,
        owned plane count). d_total: static global plane count D.
    Returns:
      [N, F, F] float32 — finalized cost at owned pixels, 0 elsewhere.
    """
    n, dl, size = slab.shape[0], slab.shape[1], slab.shape[2]
    d_ = d_total
    d0_off = float(-min_disp)
    iy = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
    ix = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)
    xs = fox[:, None, None].astype(jnp.float32) + ix[None]
    ys = foy[:, None, None].astype(jnp.float32) + iy[None]
    a = proposals[:, 0][:, None, None]
    b = proposals[:, 1][:, None, None]
    c = proposals[:, 2][:, None, None]
    d = a * xs + b * ys + c
    finite = jnp.isfinite(d)
    in_image = ((xs >= 0) & (xs < width) & (ys >= 0) & (ys < height))

    def owns(g):
        """Owner mask for primary-tap plane g (non-finite -> device 0)."""
        g = jnp.where(finite, g, 0)
        return (g >= d_base) & (g < d_base + d_owned)

    def tap_local(g):
        """Reads global plane g from the local slab (clamped into the local
        range; only owner-masked lanes consume the value)."""
        lj = jnp.clip(g - (d_base - 1), 0, dl - 1)
        v = jnp.take_along_axis(slab, lj[:, None], axis=1)[:, 0]
        return _decode(v.astype(jnp.float32), scale, zero)

    if method == 1:
        # Mirror of sample_slabs_aligned's tent contraction, with the global
        # d-grid values restricted to the local planes. An owned pixel's
        # (<= 2) non-zero tent terms lie in [d_base, d_base + d_owned] --
        # all local -- so the masked local sum equals the full-D sum.
        dv = jnp.clip(d + d0_off, 0.0, float(d_ - 1))
        own = owns(jnp.floor(dv).astype(jnp.int32))
        dgrid = (d_base - 1) + jax.lax.broadcasted_iota(
            jnp.float32, (dl, 1, 1), 0)
        tent = jnp.maximum(0.0, 1.0 - jnp.abs(dgrid[None] - dv[:, None]))
        cost = jnp.sum(slab.astype(jnp.float32) * tent, axis=1)
        cost = _decode(cost, scale, zero)
        cost = jnp.where(finite, cost, COST_FOR_INVALID)
        cost = jnp.minimum(cost, th_col)
        return jnp.where(own & in_image, cost, 0.0).astype(jnp.float32)

    zeros_i = jnp.zeros((n, size, size), jnp.int32)
    if method == 0:
        di = jnp.clip(jnp.floor(d + 0.5).astype(jnp.int32) + int(d0_off),
                      0, d_ - 1)
        own = owns(di)
        cost = tap_local(di)
        cost = jnp.where(finite, cost, COST_FOR_INVALID)
    elif method == 2:
        di = jnp.clip(jnp.floor(d + 0.5).astype(jnp.int32) + int(d0_off),
                      0, d_ - 1)
        own = owns(di)
        d1i = jnp.maximum(di - 1, 0)
        d3i = jnp.minimum(di + 1, d_ - 1)
        y1, y2, y3 = tap_local(d1i), tap_local(di), tap_local(d3i)
        rd1 = d1i.astype(jnp.float32)
        rd2 = di.astype(jnp.float32)
        rd3 = d3i.astype(jnp.float32)
        qa = y1 / (rd1 - rd2) / (rd1 - rd3)
        qb = y2 / (rd2 - rd1) / (rd2 - rd3)
        qc = y3 / (rd3 - rd1) / (rd3 - rd2)
        r = qa + qb + qc
        p = -(qa * (rd2 + rd3) + qb * (rd1 + rd3) + qc * (rd1 + rd2))
        q = qa * rd2 * rd3 + qb * rd1 * rd3 + qc * rd1 * rd2
        dv = d + float(d0_off)
        quad = r * dv * dv + p * dv + q
        cost = jnp.where(jnp.floor(d + 0.5) + d0_off < 0,
                         tap_local(zeros_i),
                         jnp.where(jnp.floor(d + 0.5) + d0_off >= d_,
                                   tap_local(jnp.full_like(zeros_i, d_ - 1)),
                                   quad))
        cost = jnp.where(finite, cost, COST_FOR_INVALID)
    else:
        raise ValueError(f"unknown interpolation method {method}")

    cost = jnp.minimum(cost, th_col)
    return jnp.where(own & in_image, cost, 0.0).astype(jnp.float32)


def _slab_chunk(vol, proposals, ox, oy, *, size, min_disp, th_col,
                scale=1.0, zero=0.0):
    slab, ocx, ocy = slice_slabs(vol, ox, oy, size)
    return sample_slabs(slab, ocx, ocy, proposals, ox, oy, vol.shape[1:],
                        size=size, min_disp=min_disp, th_col=th_col,
                        scale=scale, zero=zero)


def sample_windows(vol: jnp.ndarray, proposals: jnp.ndarray,
                   ox: jnp.ndarray, oy: jnp.ndarray, size: int,
                   min_disp: float, max_disp: float, th_col: float,
                   method: int = 1, scale: float = 1.0,
                   zero: float = 0.0) -> jnp.ndarray:
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
        v = flat[(dslice * (h * w) + base).reshape(-1)].reshape(base.shape)
        return _decode(v.astype(jnp.float32), scale, zero)

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
