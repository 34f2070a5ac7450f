"""Dual-view post-processing (reference ``PMStereoBase.h:111-256``):
left-right consistency check, horizontal nearest-neighbor hole filling, and
joint-bilateral weighted-median label replacement at failed pixels.

The consistency check and hole fill are fully vectorized (prefix scans); the
weighted median sorts the 41x41 plane-disparity patches of failed pixels only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Parameters
from ..ops import plane as plane_ops


@functools.partial(jax.jit, static_argnames=("threshold",))
def consistency_check(disp_l: jnp.ndarray, disp_r: jnp.ndarray,
                      threshold: float = 1.5):
    """Round-trip check (``PMStereoBase.h:111-144``): for each view, look up
    the other view at ``round(x - sign * d)``; fail=255 on mismatch
    > threshold, fail=128 when the reprojection leaves the image."""
    h, w = disp_l.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    def one(disp_a, disp_b, sign):
        rx = jnp.floor(xs - disp_a * sign + 0.5).astype(jnp.int32)
        inside = (rx >= 0) & (rx < w)
        rxc = jnp.clip(rx, 0, w - 1)
        d_b = jnp.take_along_axis(disp_b, rxc, axis=1)
        fail = jnp.where(inside,
                         jnp.where(jnp.abs(d_b - disp_a) > threshold, 255, 0),
                         128)
        return fail.astype(jnp.uint8)

    return one(disp_l, disp_r, 1.0), one(disp_r, disp_l, -1.0)


def _dilate3(fail: jnp.ndarray) -> jnp.ndarray:
    """3x3 binary dilation (``cv::dilate`` with the default kernel)."""
    f = fail.astype(jnp.float32)
    f = jnp.pad(f, 1)
    out = jnp.zeros_like(fail, dtype=jnp.float32)
    h, w = fail.shape
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out = jnp.maximum(out, jax.lax.dynamic_slice(f, (dy, dx), (h, w)))
    return out > 0


@jax.jit
def fill_holes(labeling: jnp.ndarray, fail: jnp.ndarray,
               fail2: jnp.ndarray) -> jnp.ndarray:
    """Horizontal nearest-valid fill (``PMStereoBase.h:169-202``).

    For each failed pixel, scan left and right for the nearest pixel with
    ``fail2 == 0`` (the dilated mask) and adopt the label of the side whose
    plane yields the LOWER disparity at the pixel (background bias).
    """
    h, w = labeling.shape[:2]
    ok = ~fail2                                   # [H, W] bool
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    left_idx = jax.lax.cummax(jnp.where(ok, idx, -1), axis=1)
    right_raw = jnp.where(ok, idx, w)
    right_idx = jnp.flip(
        jax.lax.cummin(jnp.flip(right_raw, axis=1), axis=1), axis=1)

    def grab(indices):
        safe = jnp.clip(indices, 0, w - 1)
        return jnp.take_along_axis(labeling, safe[..., None], axis=1)

    lab_l = grab(left_idx)
    lab_r = grab(right_idx)
    xs = idx.astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    d_l = plane_ops.disparity_at(lab_l, xs, ys)
    d_r = plane_ops.disparity_at(lab_r, xs, ys)

    has_l = left_idx >= 0
    has_r = right_idx < w
    use_l = has_l & ((~has_r) | (d_l < d_r))
    use_r = has_r & (~use_l)
    filled = jnp.where(use_l[..., None], lab_l,
                       jnp.where(use_r[..., None], lab_r, labeling))
    return jnp.where(fail[..., None], filled, labeling)


def weighted_median_at(labeling: np.ndarray, image_bgr: np.ndarray,
                       fail: np.ndarray, wind_r: int, omega: float):
    """Joint-bilateral weighted median of plane disparities at failed pixels
    (``PMStereoBase.h:210-252``); returns the repaired labeling.

    The patch weight is ``exp(-||I(p) - I(q)||_1 / omega)``
    (``computePatchWeight``, ``StereoEnergy.h:250-256``). Runs the sort-based
    median on the failed pixels only (host gathers the index list once).
    """
    h, w = labeling.shape[:2]
    ys, xs = np.nonzero(fail)
    if ys.size == 0:
        return labeling
    k = 2 * wind_r + 1
    n = ys.size
    # Chunk + pad to bucketed sizes: per-pixel patches are [k*k]-wide rows,
    # and small trailing dims (3/4 channels) must be kept as SEPARATE planes
    # or the TPU tiling pads them to 128 lanes (a 32x memory blowup).
    chunk = 8192
    n_pad = -(-max(n, 1) // chunk) * chunk
    ys_p = np.pad(ys, (0, n_pad - n)).astype(np.int32)
    xs_p = np.pad(xs, (0, n_pad - n)).astype(np.int32)

    lab_planes = tuple(jnp.asarray(labeling[..., c]) for c in range(4))
    img_planes = tuple(jnp.asarray(image_bgr[..., c], jnp.float32)
                       for c in range(3))
    outs = []
    for i in range(0, n_pad, chunk):
        outs.append(np.asarray(_weighted_median_kernel(
            lab_planes, img_planes, jnp.asarray(ys_p[i:i + chunk]),
            jnp.asarray(xs_p[i:i + chunk]), k, float(omega))))
    out = np.concatenate(outs, axis=0)[:n]
    repaired = np.array(labeling)
    repaired[ys, xs] = out
    return repaired


@functools.partial(jax.jit, static_argnames=("k", "omega"))
def _weighted_median_kernel(lab_planes, img_planes, ys, xs, k: int,
                            omega: float):
    h, w = lab_planes[0].shape
    r = k // 2
    kh, kw = min(k, h), min(k, w)  # images smaller than the window

    def one(y, x):
        # Clamped block slice always lies in-image; cells the clamp shifted
        # in (outside the CENTERED window) are masked out below.
        oy = jnp.clip(y - r, 0, h - kh)
        ox = jnp.clip(x - r, 0, w - kw)
        gy = jax.lax.broadcasted_iota(jnp.int32, (kh, kw), 0) + oy
        gx = jax.lax.broadcasted_iota(jnp.int32, (kh, kw), 1) + ox
        centered = (jnp.abs(gy - y) <= r) & (jnp.abs(gx - x) <= r)

        def grab(plane):
            return jax.lax.dynamic_slice(plane, (oy, ox),
                                         (kh, kw)).reshape(-1)

        a, b, c, v = (grab(p) for p in lab_planes)
        l1 = sum(jnp.abs(grab(p) - p[y, x]) for p in img_planes)
        wgt = jnp.exp(-l1 / omega) * centered.reshape(-1)
        d_at_p = a * x + b * y + c
        order = jnp.argsort(d_at_p)
        wgt_sorted = wgt[order]
        csum = jnp.cumsum(wgt_sorted)
        half = jnp.sum(wgt) / 2.0
        pick = order[jnp.argmax(csum > half)]
        return jnp.stack([a[pick], b[pick], c[pick], v[pick]])

    return jax.vmap(one)(ys, xs)


def post_process(lab_l, lab_r, im0_bgr, im1_bgr, params: Parameters,
                 threshold: float = 1.0):
    """Full dual-view post-processing pipeline (``PMStereoBase.h:146-256``)."""
    disp_l = plane_ops.disparity_map(lab_l)
    disp_r = plane_ops.disparity_map(lab_r)
    fail_l, fail_r = consistency_check(disp_l, disp_r, threshold)
    out = []
    for lab, fail_u8, im in ((lab_l, fail_l, im0_bgr),
                             (lab_r, fail_r, im1_bgr)):
        fail = np.asarray(fail_u8) > 0
        fail2 = np.asarray(_dilate3(jnp.asarray(fail)))
        filled = fill_holes(lab, jnp.asarray(fail), jnp.asarray(fail2))
        repaired = weighted_median_at(np.asarray(filled), np.asarray(im),
                                      fail, params.windR, params.omega)
        out.append(jnp.asarray(repaired))
    return out[0], out[1]


# --------------------------------------------------------------------------
# Fixed-shape (traceable / vmappable) variant for batched deployment.
# --------------------------------------------------------------------------

def _median_repair_fixed(filled, image_bgr, fail, wind_r: int, omega: float,
                         cap: int, chunk: int):
    """``weighted_median_at`` with a STATIC failed-pixel capacity: the
    index-gather is ``jnp.nonzero(size=cap)`` instead of host ``np.nonzero``,
    so the whole repair traces into one executable (vmappable over a batch).

    Padding rows (beyond the true failed count) rewrite their pixel's current
    value, so the result equals the host path whenever ``n_fail <= cap``;
    excess failed pixels keep their hole-filled labels. Returns
    ``(repaired, n_fail)`` so callers can detect overflow.
    """
    h, w = filled.shape[:2]
    k = 2 * wind_r + 1
    n_fail = jnp.sum(fail.astype(jnp.int32))
    ys, xs = jnp.nonzero(fail, size=cap, fill_value=0)
    lab_planes = tuple(filled[..., c] for c in range(4))
    img_planes = tuple(image_bgr[..., c].astype(jnp.float32)
                       for c in range(3))
    # Chunked lax.map bounds the transient patch memory exactly like the
    # host path's chunk loop.
    ys_c = ys.reshape(-1, chunk)
    xs_c = xs.reshape(-1, chunk)
    out = jax.lax.map(
        lambda yx: _weighted_median_kernel(lab_planes, img_planes, yx[0],
                                           yx[1], k, float(omega)),
        (ys_c, xs_c)).reshape(cap, 4)
    valid = jnp.arange(cap) < n_fail
    cur = filled[ys, xs]
    upd = jnp.where(valid[:, None], out, cur)
    return filled.at[ys, xs].set(upd), n_fail


@functools.partial(jax.jit, static_argnames=("wind_r", "omega", "threshold",
                                             "fail_cap", "chunk"))
def _post_process_traced(lab_l, lab_r, im0_bgr, im1_bgr, wind_r: int,
                         omega: float, threshold: float, fail_cap: int,
                         chunk: int):
    disp_l = plane_ops.disparity_map(lab_l)
    disp_r = plane_ops.disparity_map(lab_r)
    fail_l, fail_r = consistency_check(disp_l, disp_r, threshold)
    out, counts = [], []
    for lab, fail_u8, im in ((lab_l, fail_l, im0_bgr),
                             (lab_r, fail_r, im1_bgr)):
        fail = fail_u8 > 0
        fail2 = _dilate3(fail)
        filled = fill_holes(lab, fail, fail2)
        repaired, n = _median_repair_fixed(filled, im, fail, wind_r, omega,
                                           fail_cap, chunk)
        out.append(repaired)
        counts.append(n)
    return out[0], out[1], counts[0], counts[1]


def _default_cap(h: int, w: int, chunk: int) -> int:
    # 25% of pixels, rounded up to a chunk multiple — dual-view runs land
    # well under this after the GC sweeps (cones measures ~6% failed).
    return -(-(h * w) // 4 // chunk) * chunk


def post_process_fixed(lab_l, lab_r, im0_bgr, im1_bgr, params: Parameters,
                       threshold: float = 1.0, fail_cap: int = 0,
                       chunk: int = 2048):
    """Single-pair ``post_process`` as ONE device program (static shapes).

    Bit-equal to the host path whenever the failed-pixel count fits
    ``fail_cap`` (default 25% of pixels). Returns
    ``(lab_l, lab_r, n_fail_l, n_fail_r, cap)``.
    """
    h, w = lab_l.shape[:2]
    cap = -(-(fail_cap or _default_cap(h, w, chunk)) // chunk) * chunk
    ll, lr, nl, nr = _post_process_traced(
        lab_l, lab_r, jnp.asarray(im0_bgr), jnp.asarray(im1_bgr),
        params.windR, float(params.omega), float(threshold), cap, chunk)
    return ll, lr, nl, nr, cap


def post_process_batched(labs_l, labs_r, ims0, ims1, params: Parameters,
                         threshold: float = 1.0, fail_cap: int = 0,
                         chunk: int = 2048):
    """Batched dual-view post-processing: ``post_process_fixed`` vmapped over
    the leading pair axis — the whole doDual tail is one batch-parallel
    device dispatch instead of a host loop (it inherits the inputs'
    sharding, so a 'data'-sharded batch post-processes communication-free).

    Returns ``(labs_l, labs_r, n_fail_l [B], n_fail_r [B], cap)``; callers
    should re-run overflowed pairs (``n > cap``) through the host
    ``post_process`` for exact semantics.
    """
    h, w = labs_l.shape[1:3]
    cap = -(-(fail_cap or _default_cap(h, w, chunk)) // chunk) * chunk
    fn = jax.vmap(functools.partial(
        _post_process_traced, wind_r=params.windR,
        omega=float(params.omega), threshold=float(threshold),
        fail_cap=cap, chunk=chunk))
    ll, lr, nl, nr = fn(labs_l, labs_r, jnp.asarray(ims0, jnp.float32),
                        jnp.asarray(ims1, jnp.float32))
    return ll, lr, nl, nr, cap
