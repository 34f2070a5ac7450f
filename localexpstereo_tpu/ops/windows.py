"""Dense window extraction for regular region grids.

The regions of one color set form a REGULAR grid: window (m, k) has its
top-left at ``(oy0 + m * T, ox0 + k * T)`` with static stride ``T = 4 * s``
and static window side ``F``. Extracting such windows with
``vmap(dynamic_slice)`` makes XLA emit a *sequential* while loop of tiny
slices (measured ~50% of the color-step time at the fine layer, N = 468);
instead this module extracts all windows with dense reshape/concat ops:

1. one ``dynamic_slice`` of the bounding block ``[(n-1)T + F, ...]``,
2. per axis: pad to a multiple of T, reshape to tiles of height T, and
   concatenate ``ceil(F / T)`` shifted tile views, keeping the first F rows —
   window m's rows ``[mT, mT + F)`` are exactly rows ``[0, F)`` of tiles
   ``m .. m + ceil(F/T)`` stacked.

Cost: one dense copy of factor ``(F / T)^2`` overlap, no gathers, no loops.
Used for every per-color window slice in the engine (labels, costs, halos,
pairwise coefficients, guide statistics, volume slabs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _extract_axis(x: jnp.ndarray, n: int, t: int, f: int,
                  axis: int) -> jnp.ndarray:
    """[..., (n-1)*T + F, ...] -> windows [..., n, F, ...] at stride T.

    The input axis is replaced by two axes (window index n, within-window F).
    """
    length = x.shape[axis]
    kp = -(-f // t)                     # tiles spanned by one window
    pad_to = (n - 1 + kp) * t
    if pad_to > length:
        pw = [(0, 0)] * x.ndim
        pw[axis] = (0, pad_to - length)
        x = jnp.pad(x, pw)
    elif pad_to < length:
        x = jax.lax.slice_in_dim(x, 0, pad_to, axis=axis)
    shape = x.shape[:axis] + (n - 1 + kp, t) + x.shape[axis + 1:]
    x = x.reshape(shape)
    parts = [jax.lax.slice_in_dim(x, i, i + n, axis=axis) for i in range(kp)]
    y = parts[0] if kp == 1 else jnp.concatenate(parts, axis=axis + 1)
    if kp * t > f:
        y = jax.lax.slice_in_dim(y, 0, f, axis=axis + 1)
    return y


def dense_windows(arr: jnp.ndarray, oy0, ox0, nby: int, nbx: int, t: int,
                  f: int, fx: int = 0) -> jnp.ndarray:
    """[Hp, Wp, ...] -> [nby * nbx, F, Fx, ...] windows on a regular grid.

    Window (m, k) covers rows ``[oy0 + m*T, +F)``, cols ``[ox0 + k*T, +Fx)``
    (array coordinates; callers add padding/canvas offsets; Fx defaults to
    F). ``oy0``/``ox0`` may be traced scalars; T, F, nby, nbx are static.
    The flat region index is ``m * nbx + k`` (row-major), matching
    ``grid.Layer.color_regions``.
    """
    fx = fx or f
    trailing = arr.shape[2:]
    hblk = (nby - 1) * t + f
    wblk = (nbx - 1) * t + fx
    blk = jax.lax.dynamic_slice(
        arr, (oy0, ox0) + (0,) * len(trailing), (hblk, wblk) + trailing)
    x = _extract_axis(blk, nby, t, f, axis=0)    # [nby, F, Wblk, ...]
    x = _extract_axis(x, nbx, t, fx, axis=2)     # [nby, F, nbx, Fx, ...]
    x = jnp.moveaxis(x, 2, 1)                    # [nby, nbx, F, Fx, ...]
    return x.reshape((nby * nbx, f, fx) + trailing)


def dense_windows_leading(arr: jnp.ndarray, oy0, ox0, nby: int, nbx: int,
                          t: int, f: int) -> jnp.ndarray:
    """[C, Hp, Wp] -> [nby * nbx, C, F, F] windows on a regular grid."""
    c = arr.shape[0]
    x = dense_windows_block_leading(arr, oy0, ox0, nby, nbx, t, f)
    x = jnp.transpose(x, (1, 3, 0, 2, 4))        # [nby, nbx, C, F, F]
    return x.reshape((nby * nbx, c, f, f))


def dense_windows_block_leading(arr: jnp.ndarray, oy0, ox0, nby: int,
                                nbx: int, t: int, f: int) -> jnp.ndarray:
    """[C, Hp, Wp] -> [C, nby, F, nbx, F] windows in BLOCK layout."""
    c = arr.shape[0]
    hblk = (nby - 1) * t + f
    wblk = (nbx - 1) * t + f
    blk = jax.lax.dynamic_slice(arr, (0, oy0, ox0), (c, hblk, wblk))
    x = _extract_axis(blk, nby, t, f, axis=1)    # [C, nby, F, Wblk]
    x = _extract_axis(x, nbx, t, f, axis=3)      # [C, nby, F, nbx, F]
    return x


def dense_block_parts(arr: jnp.ndarray, oy0, ox0, nby: int, nbx: int,
                      t: int, f: int):
    """[C, Hp, Wp] -> UN-exploded window coverage on a regular grid.

    The block-major unary backend computes per-pixel costs on the windows'
    bounding block instead of exploding [N, C, F, F] slabs (factor (F/T)^2
    duplication AND a 2x lane-fill loss when F ~ 62 vs the block's
    full-width minor dim). When F > T adjacent windows overlap by
    E = F - T pixels; those pixels are evaluated under BOTH owners' plane
    proposals, so the coverage splits into four parts (window row/col
    phase x body/tail):

      main   [C, nby*T, nbx*T]  rows m*T+u  under window row m, col k
      rows   [C, nby*E, nbx*T]  rows (m+1)*T+u (u < E) under window row m
      cols   [C, nby*T, nbx*E]  cols (k+1)*T+v (v < E) under window col k
      corner [C, nby*E, nbx*E]  both tails

    All four are pure reshape/slice views of one ``dynamic_slice`` bounding
    block — no gathers, no per-window copies of the C axis.
    ``assemble_window_quadrants`` stitches per-pixel RESULTS computed on
    these parts back into [N, F, F] windows. For F <= T (no overlap) only
    ``main`` is returned (sized for :func:`_extract_axis` extraction) and
    the other three are None.
    """
    e = f - t
    if e <= 0:
        hblk = (nby - 1) * t + f
        wblk = (nbx - 1) * t + f
        blk = jax.lax.dynamic_slice(arr, (0, oy0, ox0),
                                    (arr.shape[0], hblk, wblk))
        return blk, None, None, None
    c = arr.shape[0]
    hblk = nby * t + e
    wblk = nbx * t + e
    blk = jax.lax.dynamic_slice(arr, (0, oy0, ox0), (c, hblk, wblk))
    main = blk[:, :nby * t, :nbx * t]
    rows = _extract_axis(blk[:, t:, :nbx * t], nby, t, e, axis=1)
    rows = rows.reshape(c, nby * e, nbx * t)
    cols = _extract_axis(blk[:, :nby * t, t:], nbx, t, e, axis=2)
    cols = cols.reshape(c, nby * t, nbx * e)
    corner = _extract_axis(blk[:, t:, t:], nby, t, e, axis=1)
    corner = _extract_axis(corner, nbx, t, e, axis=3)
    corner = corner.reshape(c, nby * e, nbx * e)
    return main, rows, cols, corner


def assemble_window_quadrants(main: jnp.ndarray, rows, cols, corner,
                              nby: int, nbx: int, t: int,
                              f: int) -> jnp.ndarray:
    """Stitches per-pixel results on :func:`dense_block_parts` parts back
    into [nby * nbx, F, F] windows (row-major region index)."""
    e = f - t
    if e <= 0:
        x = _extract_axis(main, nby, t, f, axis=0)   # [nby, F, Wblk]
        x = _extract_axis(x, nbx, t, f, axis=2)      # [nby, F, nbx, F]
        x = jnp.moveaxis(x, 2, 1)
        return x.reshape(nby * nbx, f, f)
    body = main.reshape(nby, t, nbx, t)
    rstrip = rows.reshape(nby, e, nbx, t)
    cstrip = cols.reshape(nby, t, nbx, e)
    cor = corner.reshape(nby, e, nbx, e)
    top = jnp.concatenate([body, cstrip], axis=3)    # [nby, T, nbx, F]
    bot = jnp.concatenate([rstrip, cor], axis=3)     # [nby, E, nbx, F]
    full = jnp.concatenate([top, bot], axis=1)       # [nby, F, nbx, F]
    return jnp.transpose(full, (0, 2, 1, 3)).reshape(nby * nbx, f, f)
