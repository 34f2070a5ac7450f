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
