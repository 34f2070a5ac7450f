"""Batched proposal generators (reference ``Proposer.h``).

Each proposer produces ONE candidate plane per region for a whole color set
at once, from the region's current labels. The reference clones proposer
objects per OpenMP thread and advances ``cv::theRNG()`` streams; here every
(region, step) draw uses an independent stateless ``jax.random`` key, so runs
are deterministic for a fixed seed (SURVEY.md section 7.7).

Proposal semantics:

- expansion (``Proposer.h:34-80``): the current label of a uniformly random
  pixel of the unit cell — propagates existing planes into the 3x3 shared
  region (the "expansion" in local expansion moves).
- random perturbation (``Proposer.h:84-153``): from a random in-cell label,
  re-draw z within +-dz of its disparity and jitter the normal, with
  dz = (max_d - min_d) * 0.5^(m+1), normal radius 0.5^m, m = outer_iter + k.
- RANSAC (``Proposer.h:155-312``): MSAC plane fit to the cell's current
  disparities; the reference's adaptive sample count (cap 500, conf 0.95)
  becomes a fixed batch of hypotheses evaluated in parallel (TPU-friendly;
  statistically equivalent for the inlier ratios seen in practice), followed
  by one least-squares refit on the best hypothesis' inliers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import plane as plane_ops

#: Hypotheses evaluated per RANSAC activation (see module docstring).
RANSAC_HYPOTHESES = 32
RANSAC_THRESHOLD = 1.0  # inlier threshold (Proposer.h:308)


def _cell_pixel(key: jax.Array, ox, oy, cw, ch):
    """Uniform random pixel inside the clipped unit cell.

    Matches ``selectRandomPixelInRect`` (``Proposer.h:37-44``): a single
    uniform draw over the cell's pixel count, split into (x, y).
    Returns in-cell (local) integer coords [N].
    """
    u = jax.random.uniform(key, ox.shape)
    n = jnp.floor(u * (cw * ch).astype(jnp.float32)).astype(jnp.int32)
    n = jnp.minimum(n, cw * ch - 1)
    xx = n % jnp.maximum(cw, 1)
    yy = n // jnp.maximum(cw, 1)
    return xx, yy


def _label_at(cell_labels: jnp.ndarray, xx: jnp.ndarray, yy: jnp.ndarray):
    """Gathers [N, 4] labels at per-region local coords from [N, s, s, 4]."""
    n, s = cell_labels.shape[0], cell_labels.shape[1]
    flat = cell_labels.reshape(n, s * s, 4)
    idx = (yy * s + xx)[:, None, None]
    return jnp.take_along_axis(flat, jnp.broadcast_to(idx, (n, 1, 4)),
                               axis=1)[:, 0]


def expansion(key: jax.Array, cell_labels: jnp.ndarray, ox, oy, cw, ch):
    """[N, 4] expansion proposals: random in-cell current label."""
    xx, yy = _cell_pixel(key, ox, oy, cw, ch)
    return _label_at(cell_labels, xx, yy)


def random_perturbation(key: jax.Array, cell_labels: jnp.ndarray, ox, oy, cw,
                        ch, dz, nr, min_disp: float, max_disp: float,
                        max_vdisp: float = 0.0):
    """[N, 4] perturbation proposals.

    Args:
      dz: disparity perturbation half-width (max_d - min_d) * 0.5^(m+1) with
        m = outer_iter + k (``Proposer.h:93-96``); traced scalar so a varying
        decay step never forces a recompile.
      nr: normal jitter radius 0.5^m (``Proposer.h:142``).
    """
    kp, kz, kn, kv = jax.random.split(key, 4)
    xx, yy = _cell_pixel(kp, ox, oy, cw, ch)
    base = _label_at(cell_labels, xx, yy)
    gx = (ox + xx).astype(jnp.float32)
    gy = (oy + yy).astype(jnp.float32)
    zs = plane_ops.disparity_at(base, gx, gy)

    minz = jnp.maximum(min_disp, zs - dz)
    maxz = jnp.minimum(max_disp, zs + dz)
    z_new = jax.random.uniform(kz, zs.shape) * (maxz - minz) + minz

    n0 = plane_ops.get_normal(base)
    jitter = plane_ops.random_unit_vector(kn, jnp.pi, zs.shape) * nr
    n1 = n0 + jitter
    n1 = n1 / jnp.linalg.norm(n1, axis=-1, keepdims=True)

    if max_vdisp != 0.0:
        # dv decays at the same rate as dz (Proposer.h:135-141).
        dv = dz / max(max_disp - min_disp, 1e-9) * max_vdisp
        vs = base[:, 3]
        minv = jnp.maximum(-max_vdisp, vs - dv)
        maxv = jnp.minimum(max_vdisp, vs + dv)
        v_new = jax.random.uniform(kv, vs.shape) * (maxv - minv) + minv
    else:
        v_new = base[:, 3]

    return plane_ops.create_plane(n1, z_new, gx, gy, v_new)


def random_proposal_count(k_max: int, outer_iter: int, min_disp: float,
                          max_disp: float, do_early_stop: bool = True) -> int:
    """Static count of perturbation proposals for this outer iteration: the
    reference early-stops when dz(outer_iter + k) < 0.1 (``Proposer.h:149-152``)."""
    if not do_early_stop:
        return k_max
    count = 0
    for k in range(k_max):
        if (max_disp - min_disp) * (0.5 ** (outer_iter + k + 1)) < 0.1:
            break
        count += 1
    return count


def _solve3x3(ata: jnp.ndarray, atb: jnp.ndarray):
    """Batched 3x3 solve via the adjugate; returns (solution, ok_mask)."""
    a = ata
    det = (a[..., 0, 0] * (a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1])
           - a[..., 0, 1] * (a[..., 1, 0] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 0])
           + a[..., 0, 2] * (a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]))
    adj = jnp.stack([
        a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1],
        a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2],
        a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1],
        a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2],
        a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0],
        a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2],
        a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0],
        a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1],
        a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0],
    ], axis=-1).reshape(*a.shape[:-2], 3, 3)
    ok = jnp.abs(det) > 1e-12
    safe_det = jnp.where(ok, det, 1.0)
    sol = jnp.einsum("...ij,...j->...i", adj, atb) / safe_det[..., None]
    return sol, ok


def ransac(key: jax.Array, cell_labels: jnp.ndarray, ox, oy, cw, ch,
           num_hypotheses: int = RANSAC_HYPOTHESES,
           threshold: float = RANSAC_THRESHOLD):
    """[N, 4] MSAC plane fits to each cell's current disparities.

    Data points are the cell's pixels (x, y, 1) -> d in GLOBAL coordinates
    (``Proposer.h:283-301``). Out-of-image cell pixels are masked out.
    """
    n, s = cell_labels.shape[0], cell_labels.shape[1]
    iy = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    gxg = (ox[:, None, None] + ix[None]).astype(jnp.float32)   # global coords
    gyg = (oy[:, None, None] + iy[None]).astype(jnp.float32)
    in_cell = (ix[None] < cw[:, None, None]) & (iy[None] < ch[:, None, None])
    d = plane_ops.disparity_at(cell_labels, gxg, gyg)          # [N, s, s]

    # Fit in CELL-LOCAL coordinates: the reference fits in global coords with
    # double-precision SVD (Proposer.h:205); in float32, centering keeps the
    # normal equations well-conditioned. The plane is shifted back at the end.
    gx = jnp.broadcast_to(ix[None].astype(jnp.float32),
                          (n, s, s)).reshape(n, -1)
    gy = jnp.broadcast_to(iy[None].astype(jnp.float32),
                          (n, s, s)).reshape(n, -1)
    d = d.reshape(n, -1)
    w = in_cell.reshape(n, -1).astype(jnp.float32)             # [N, P]

    # --- hypotheses: 3 random in-cell points each, exact 3x3 fit ----------
    keys = jax.random.split(key, 3)
    pts = []
    for kk in keys:
        xx, yy = _cell_pixel(kk, jnp.tile(ox, num_hypotheses),
                             jnp.tile(oy, num_hypotheses),
                             jnp.tile(cw, num_hypotheses),
                             jnp.tile(ch, num_hypotheses))
        pts.append((xx.reshape(num_hypotheses, n),
                    yy.reshape(num_hypotheses, n)))

    def fit3(xx0, yy0, xx1, yy1, xx2, yy2):
        # Rows of the 3x3 system [x y 1][a b c]^T = d, in cell-local coords.
        reg = jnp.arange(n)[None, :]

        def grab(xx, yy):  # [NH, N] per-region point picks
            idx = yy * s + xx
            return gx[reg, idx], gy[reg, idx], d[reg, idx]

        x0, y0, d0 = grab(xx0, yy0)
        x1, y1, d1 = grab(xx1, yy1)
        x2, y2, d2 = grab(xx2, yy2)
        one = jnp.ones_like(x0)
        A = jnp.stack([jnp.stack([x0, y0, one], -1),
                       jnp.stack([x1, y1, one], -1),
                       jnp.stack([x2, y2, one], -1)], -2)
        b = jnp.stack([d0, d1, d2], -1)
        # Direct 3x3 solve; a vanishing determinant (collinear / repeated
        # sample points) marks the hypothesis degenerate.
        return _solve3x3(A, b)

    (h_abc, h_ok) = fit3(pts[0][0], pts[0][1], pts[1][0], pts[1][1],
                         pts[2][0], pts[2][1])               # [NH, N, 3]

    # --- score: inlier count over cell pixels ------------------------------
    res = jnp.abs(h_abc[..., 0][..., None] * gx[None]
                  + h_abc[..., 1][..., None] * gy[None]
                  + h_abc[..., 2][..., None] - d[None])       # [NH, N, P]
    inlier = (res < threshold).astype(jnp.float32) * w[None]
    counts = jnp.where(h_ok, inlier.sum(-1), -1.0)            # [NH, N]
    best = jnp.argmax(counts, axis=0)                         # [N]

    best_abc = jnp.take_along_axis(
        h_abc, best[None, :, None].repeat(3, axis=-1), axis=0)[0]  # [N, 3]
    best_in = jnp.take_along_axis(inlier, best[None, :, None], axis=0)[0]

    # --- refit on inliers (weighted least squares) --------------------------
    one = jnp.ones_like(gx)
    feats = jnp.stack([gx, gy, one], -1)                      # [N, P, 3]
    wgt = best_in[..., None]
    ata = jnp.einsum("npi,npj->nij", feats * wgt, feats)
    atb = jnp.einsum("npi,np->ni", feats * wgt, d * best_in)
    refit, ok = _solve3x3(ata, atb)
    abc = jnp.where(ok[:, None], refit, best_abc)
    # If even the best hypothesis was degenerate, fall back to the zero plane
    # (the reference's default 'result' is zeros; Proposer.h:185).
    any_ok = jnp.take_along_axis(h_ok, best[None], axis=0)[0]
    abc = jnp.where(any_ok[:, None], abc, 0.0)
    # Shift from cell-local back to global coordinates:
    # d = a*(x - ox) + b*(y - oy) + c_local.
    a, b, c_local = abc[:, 0], abc[:, 1], abc[:, 2]
    c = c_local - a * ox.astype(jnp.float32) - b * oy.astype(jnp.float32)
    return jnp.stack([a, b, c, jnp.zeros_like(c)], axis=-1)


def completion_labeling(labeling, image, block: int = 48,
                        offset=(0, 0), irls_rounds: int = 3,
                        texture_radius: int = 2):
    """Piecewise-planar completion of a labeling (host-side, numpy).

    For each ``block`` x ``block`` tile of the image (grid shifted by
    ``offset``), robust-fits ONE plane to the tile's current plane-induced
    disparities, weighting samples by local image texture — low-texture
    pixels, where the data term is shallow and planes drift, get near-zero
    weight — then paints the whole tile with the fitted plane. The result
    is an external labeling for :meth:`LocalExpansionSolver.fuse`: the
    per-pixel fusion min-cut adopts the completion exactly where it lowers
    the energy. This is the large-move escape for low-texture traps that
    per-region expansion cannot perform (PARITY.md, "Anatomy of the
    residual venus/tsukuba gap"): the confident surround dictates the
    plane across the unconfident interior.

    Deterministic IRLS (Cauchy reweighting) replaces the reference's
    randomized RANSAC (``Proposer.h:177-240``) — the fit is over ~1000s of
    samples per tile and feeds a guarded fusion, so robustness without RNG
    is the right trade.

    Args:
      labeling: [H, W, 4] current labels.
      image: [H, W, 3] BGR float image (texture source).
      block: tile size in pixels.
      offset: (dy, dx) grid shift — fuse several offsets so tile seams of
        one grid fall inside tiles of another.
      irls_rounds: reweighted refits after the initial weighted LSQ.
      texture_radius: half-window of the local-variance texture measure.

    Returns:
      [H, W, 4] float32 external labeling (v = 0 everywhere).
    """
    import numpy as np

    lab = np.asarray(labeling, np.float32)
    h, w = lab.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d = lab[..., 0] * xs + lab[..., 1] * ys + lab[..., 2]

    # Local-variance texture confidence via box sums.
    gray = np.asarray(image, np.float32).mean(-1)
    r = texture_radius
    k = 2 * r + 1

    def box(a):
        p = np.pad(a, r, mode="edge")
        c = np.cumsum(np.cumsum(p, 0), 1)
        c = np.pad(c, ((1, 0), (1, 0)))
        return (c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]) / (k * k)

    var = np.maximum(box(gray * gray) - box(gray) ** 2, 0.0)
    conf = np.sqrt(var)

    out = np.empty_like(lab)
    oy0, ox0 = int(offset[0]) % block, int(offset[1]) % block
    y_edges = [0] + list(range(oy0 if oy0 else block, h, block)) + [h]
    x_edges = [0] + list(range(ox0 if ox0 else block, w, block)) + [w]
    for yi in range(len(y_edges) - 1):
        for xi in range(len(x_edges) - 1):
            y0, y1 = y_edges[yi], y_edges[yi + 1]
            x0, x1 = x_edges[xi], x_edges[xi + 1]
            if y0 >= y1 or x0 >= x1:
                continue
            tx = xs[y0:y1, x0:x1].ravel()
            ty = ys[y0:y1, x0:x1].ravel()
            td = d[y0:y1, x0:x1].ravel()
            base_w = conf[y0:y1, x0:x1].ravel().copy()
            if not np.any(base_w > 0):
                # Fully textureless tile: fall back to uniform weights for
                # EVERY round (reweighting from zero confidence would
                # collapse the fit to the zero plane).
                base_w = np.ones_like(base_w)
            tw = base_w.copy()
            # Center coordinates for conditioning (cf. ransac()).
            cx_, cy_ = tx.mean(), ty.mean()
            a_mat = np.stack([tx - cx_, ty - cy_, np.ones_like(tx)], -1)
            p = None
            for _ in range(irls_rounds + 1):
                aw = a_mat * tw[:, None]
                ata = aw.T @ a_mat
                atb = aw.T @ td
                try:
                    p = np.linalg.solve(ata + 1e-6 * np.eye(3), atb)
                except np.linalg.LinAlgError:  # pragma: no cover
                    p = np.array([0.0, 0.0, float(np.median(td))])
                resid = a_mat @ p - td
                tw = base_w / (1.0 + resid ** 2)
            a, b = p[0], p[1]
            c = p[2] - a * cx_ - b * cy_
            out[y0:y1, x0:x1, 0] = a
            out[y0:y1, x0:x1, 1] = b
            out[y0:y1, x0:x1, 2] = c
            out[y0:y1, x0:x1, 3] = 0.0
    return out
