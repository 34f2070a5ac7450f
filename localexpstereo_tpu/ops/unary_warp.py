"""V2 (image-based) data term: plane-induced warp matching cost.

TPU-native equivalent of ``NaiveStereoEnergy`` (``StereoEnergy.h:629-764``).
The reference warps the other view's 4-channel feature image by the affine
map induced by the plane (``getAffineTransform`` + ``warpAffine`` with
INTER_LINEAR / BORDER_REPLICATE). Because the plane's disparity is affine in
(x, y), that warp is exactly per-pixel bilinear sampling at
``(x - sign * d(x, y), y + v)`` — which on TPU is a batched gather, no affine
machinery needed.

Raw cost (``StereoEnergy.h:730-741``):
    min(tau_col, ||dBGR||_1) + min(tau_grad, |d gx|)
with tau_col = th_col * (1 - alpha), tau_grad = th_grad * alpha, and the
feature image ExI = [BGR * (1 - alpha), sobel_x(gray) * 0.5 * alpha]
(``StereoEnergy.h:647-664``; Sobel ksize=1, scale 0.5, replicate border).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def build_feature_image(image_bgr: np.ndarray, alpha: float) -> np.ndarray:
    """Builds the 4-channel feature image ExI on host.

    Args:
      image_bgr: [H, W, 3] float32 BGR 0..255 (cv::imread channel order, so
        the grayscale weights match the reference's cvtColor BGR2GRAY).
    Returns:
      [H, W, 4] float32: BGR * (1 - alpha), then gx * alpha.
    """
    img = np.asarray(image_bgr, np.float32)
    gray = (0.114 * img[..., 0] + 0.587 * img[..., 1] + 0.299 * img[..., 2])
    padded = np.pad(gray, ((0, 0), (1, 1)), mode="edge")
    gx = 0.5 * (padded[:, 2:] - padded[:, :-2])
    return np.concatenate([img * (1.0 - alpha),
                           (gx * alpha)[..., None]], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("size", "sign", "th_col", "th_grad",
                                    "alpha", "max_disp"))
def sample_windows_slab(exi_self: jnp.ndarray, exi_other: jnp.ndarray,
                        proposals: jnp.ndarray, ox: jnp.ndarray,
                        oy: jnp.ndarray, size: int, sign: float,
                        th_col: float, th_grad: float, alpha: float,
                        max_disp: float) -> jnp.ndarray:
    """Slab-based V2 matching costs (fast path, v == 0 only).

    The gather formulation pays per-element index latency; here each region
    slices a contiguous other-view slab wide enough for every reachable
    disparity (``src_x = x - sign*d`` with d in [0, max_disp]) and evaluates
    the bilinear sample as a dense tent-weight contraction over slab columns
    (an MXU matvec per row). Border replication emerges from clipping the
    target coordinate; identical to :func:`sample_windows` for v == 0.
    """
    h, w = exi_self.shape[:2]
    n = proposals.shape[0]
    m = int(np.ceil(max_disp)) + 1
    ws = size + m
    assert ws <= w, "image narrower than window + disparity range"

    # Clamped self-window origin (shift-back at the end, volume-slab style).
    ocx = jnp.clip(ox, 0, w - size)
    ocy = jnp.clip(oy, 0, h - size)

    def slice_self(o):
        return jax.lax.dynamic_slice(exi_self, (o[1], o[0], 0),
                                     (size, size, 4))

    f_self = jax.vmap(slice_self)(jnp.stack([ocx, ocy], -1))

    # Other-view slab covering src_x for every d in [0, max_disp].
    sx0 = ocx - (m if sign > 0 else 0)
    sx0 = jnp.clip(sx0, 0, w - ws)

    def slice_other(o):
        return jax.lax.dynamic_slice(exi_other, (o[1], o[0], 0),
                                     (size, ws, 4))

    f_other_slab = jax.vmap(slice_other)(jnp.stack([sx0, ocy], -1))

    iy = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
    ix = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)
    xs = ocx[:, None, None].astype(jnp.float32) + ix[None]
    ys = ocy[:, None, None].astype(jnp.float32) + iy[None]
    a = proposals[:, 0][:, None, None]
    b = proposals[:, 1][:, None, None]
    c = proposals[:, 2][:, None, None]
    d = a * xs + b * ys + c
    src_x = jnp.clip(xs - sign * d, 0.0, float(w - 1))   # BORDER_REPLICATE

    cols = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, ws), 3)
    col_abs = cols + sx0[:, None, None, None].astype(jnp.float32)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(col_abs - src_x[..., None]))

    # [N, F(row), ws, ch] x [N, F(row), F(col), ws] -> [N, F, F, ch]
    f_other = jnp.einsum("nrwc,nrjw->nrjc", f_other_slab, tent,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)

    diff = jnp.abs(f_self - f_other)
    cost = (jnp.minimum(th_col * (1.0 - alpha),
                        diff[..., 0] + diff[..., 1] + diff[..., 2])
            + jnp.minimum(th_grad * alpha, diff[..., 3]))

    # Shift from clamped to requested window coordinates; mask off-image.
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


def sample_exi_slabs_aligned(f_self: jnp.ndarray, f_other_slab: jnp.ndarray,
                             proposals: jnp.ndarray, fox: jnp.ndarray,
                             foy: jnp.ndarray, height: int, width: int, *,
                             sign: float, th_col: float, th_grad: float,
                             alpha: float, m: int) -> jnp.ndarray:
    """V2 matching costs from pre-sliced ALIGNED feature slabs (v == 0).

    Proposal-independent slabs are hoisted once per color step:
      f_self: [N, F, F, 4] self-view feature windows at origins (fox, foy);
      f_other_slab: [N, F, F + m, 4] other-view slab starting at column
        ``fox - m`` (left view, sign > 0) or ``fox`` (right view).
    Out-of-image slab content is the padded zero margin — don't-care, since
    ``src_x`` is clipped to the real image columns and out-of-image window
    pixels are masked.
    """
    n, size = f_self.shape[0], f_self.shape[1]
    iy = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
    ix = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)
    xs = fox[:, None, None].astype(jnp.float32) + ix[None]
    ys = foy[:, None, None].astype(jnp.float32) + iy[None]
    a = proposals[:, 0][:, None, None]
    b = proposals[:, 1][:, None, None]
    c = proposals[:, 2][:, None, None]
    d = a * xs + b * ys + c
    src_x = jnp.clip(xs - sign * d, 0.0, float(width - 1))

    ws = f_other_slab.shape[2]
    sx0 = fox - (m if sign > 0 else 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, ws), 3)
    col_abs = cols + sx0[:, None, None, None].astype(jnp.float32)
    tent = jnp.maximum(0.0, 1.0 - jnp.abs(col_abs - src_x[..., None]))

    f_other = jnp.einsum("nrwc,nrjw->nrjc", f_other_slab, tent,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)

    diff = jnp.abs(f_self - f_other)
    cost = (jnp.minimum(th_col * (1.0 - alpha),
                        diff[..., 0] + diff[..., 1] + diff[..., 2])
            + jnp.minimum(th_grad * alpha, diff[..., 3]))
    in_image = ((xs >= 0) & (xs < width) & (ys >= 0) & (ys < height))
    return jnp.where(in_image, cost, 0.0).astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("size", "sign", "th_col", "th_grad",
                                    "alpha"))
def sample_windows(exi_self: jnp.ndarray, exi_other: jnp.ndarray,
                   proposals: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                   size: int, sign: float, th_col: float, th_grad: float,
                   alpha: float) -> jnp.ndarray:
    """Raw V2 matching costs for a batch of square windows.

    Args:
      exi_self: [H, W, 4] feature image of the view being solved.
      exi_other: [H, W, 4] feature image of the other view.
      proposals: [N, 4] plane labels (a, b, c, v).
      ox, oy: [N] int32 global coords of the window top-left.
      sign: +1 when solving the left view, -1 for the right
        (``StereoEnergy.h:705``).
    Returns:
      [N, F, F] raw costs (0 outside the image).
    """
    h, w = exi_self.shape[:2]
    iy = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    ys = oy[:, None, None] + iy[None]
    xs = ox[:, None, None] + ix[None]
    in_image = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    yc = jnp.clip(ys, 0, h - 1)
    xc = jnp.clip(xs, 0, w - 1)

    xf = xs.astype(jnp.float32)
    yf = ys.astype(jnp.float32)
    a = proposals[:, 0][:, None, None]
    b = proposals[:, 1][:, None, None]
    c = proposals[:, 2][:, None, None]
    v = proposals[:, 3][:, None, None]
    d = a * xf + b * yf + c
    src_x = xf - sign * d
    src_y = yf + v

    flat_self = exi_self.reshape(-1, 4)
    flat_other = exi_other.reshape(-1, 4)
    f_self = flat_self[(yc * w + xc).reshape(-1)].reshape(*xs.shape, 4)

    # Bilinear sample with replicate border (warpAffine BORDER_REPLICATE).
    x0f = jnp.floor(src_x)
    y0f = jnp.floor(src_y)
    wx = (src_x - x0f)[..., None]
    wy = (src_y - y0f)[..., None]
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)

    def tap(yi, xi):
        return flat_other[(yi * w + xi).reshape(-1)].reshape(*xs.shape, 4)

    f_other = ((1 - wy) * ((1 - wx) * tap(y0, x0) + wx * tap(y0, x1))
               + wy * ((1 - wx) * tap(y1, x0) + wx * tap(y1, x1)))

    diff = jnp.abs(f_self - f_other)
    cost = (jnp.minimum(th_col * (1.0 - alpha),
                        diff[..., 0] + diff[..., 1] + diff[..., 2])
            + jnp.minimum(th_grad * alpha, diff[..., 3]))
    return jnp.where(in_image, cost, 0.0).astype(jnp.float32)
