"""Pairwise (smoothness) terms of the MRF energy.

The pairwise potential between pixels p, q with plane labels f_p, f_q is the
truncated curvature penalty

    psi(f_p, f_q) = w_pq * min(|d_{f_p}(p) - d_{f_q}(p)|
                               + |d_{f_p}(q) - d_{f_q}(q)|, tau) * lambda
    w_pq = max(exp(-||I(p) - I(q)||_1 / omega), epsilon), 0 across the border

(reference ``StereoEnergy.h:131-163`` for the precomputed weights and
``StereoEnergy.h:225-236`` for the term). This module provides:

- :func:`smoothness_coeffs`: the per-pixel 8-neighbor weights,
- :func:`smoothness_cost`: the full-image energy audit
  (``StereoEnergy.h:165-201``),
- :func:`expansion_tables`: vectorized per-window cost00/01/10 tables for
  the binary expansion move (``StereoEnergy.h:398-453``),
- :func:`boundary_tlinks`: the extra unary terms absorbing fixed labels just
  outside the move window (``FastGCStereo.h:440-477``).

All window functions operate on fixed-shape windows with a 1-pixel halo and
are batched over regions with ``jax.vmap``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

#: Neighbor offsets (dx, dy) in the reference's order (``StereoEnergy.h:99-110``).
NEIGHBORS = (
    (-1, 0),   # 0 LE
    (+1, 0),   # 1 GE
    (0, -1),   # 2 EL
    (0, +1),   # 3 EG
    (-1, -1),  # 4 LL
    (+1, -1),  # 5 GL
    (-1, +1),  # 6 LG
    (+1, +1),  # 7 GG
)

#: Indices of the "forward" neighbors (raster order n.y*W + n.x > 0), the set
#: used for interior pairwise edges (``StereoEnergy.h:352,421``): GE, EG, LG, GG.
FORWARD = (1, 3, 6, 7)


def _shifted(img: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """img sampled at p + (dx, dy) with zero fill outside. img is [H, W, ...]."""
    h, w = img.shape[0], img.shape[1]
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (img.ndim - 2)
    padded = jnp.pad(img, pad)
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(padded, 1 + dy, h, axis=0), 1 + dx, w,
        axis=1)


@functools.partial(jax.jit, static_argnames=("omega", "epsilon"))
def smoothness_coeffs(image: jnp.ndarray, omega: float,
                      epsilon: float) -> jnp.ndarray:
    """Per-pixel pairwise weights for all 8 neighbors.

    Args:
      image: [H, W, 3] float 0..255 (BGR or RGB; the L1 norm is symmetric).
    Returns:
      [8, H, W]: ``max(eps, exp(-||I(p+n) - I(p)||_1 / omega))``, zeroed where
      ``p + n`` falls outside the image (``StereoEnergy.h:131-163``).
    """
    h, w = image.shape[:2]
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    outs = []
    for dx, dy in NEIGHBORS:
        nb = _shifted(image, dx, dy)
        l1 = jnp.sum(jnp.abs(nb - image), axis=-1)
        coeff = jnp.maximum(jnp.exp(-l1 / omega), epsilon)
        inside = ((xs + dx >= 0) & (xs + dx < w) & (ys + dy >= 0)
                  & (ys + dy < h))
        outs.append(jnp.where(inside, coeff, 0.0))
    return jnp.stack(outs).astype(jnp.float32)


def _disp(labels: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    return labels[..., 0] * xs + labels[..., 1] * ys + labels[..., 2]


@functools.partial(jax.jit, static_argnames=("lambda_", "tau"))
def smoothness_cost(labeling: jnp.ndarray, coeffs: jnp.ndarray,
                    lambda_: float, tau: float) -> jnp.ndarray:
    """Full-image smoothness energy audit over the 4 forward neighbors
    (each edge once; ``StereoEnergy.h:165-201``).

    Args:
      labeling: [H, W, 4].
      coeffs: [8, H, W] from :func:`smoothness_coeffs`.
    """
    h, w = labeling.shape[:2]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d_ee_ee = _disp(labeling, xs, ys)
    total = jnp.float32(0.0)
    for k in FORWARD:
        dx, dy = NEIGHBORS[k]
        lab_nb = _shifted(labeling, dx, dy)
        xq, yq = xs + dx, ys + dy
        d_nb_ee = _disp(lab_nb, xs, ys)
        d_ee_nb = _disp(labeling, xq, yq)
        d_nb_nb = _disp(lab_nb, xq, yq)
        curv = jnp.abs(d_ee_ee - d_nb_ee) + jnp.abs(d_ee_nb - d_nb_nb)
        total += jnp.sum(jnp.minimum(curv, tau) * coeffs[k]) * lambda_
    return total


@functools.partial(jax.jit, static_argnames=("lambda_", "tau"))
def expansion_tables(labels_halo: jnp.ndarray, proposal: jnp.ndarray,
                     coeff_fwd: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                     lambda_: float, tau: float):
    """Pairwise tables of the binary expansion move on one S x S window.

    For each forward neighbor direction the returned [4, S, S] tables hold the
    pairwise cost at edge (p, q=p+n) for the four binary states (0 = keep
    current label, 1 = take ``proposal``): cost00, cost01 (q switches),
    cost10 (p switches); cost11 is identically 0 because the curvature penalty
    of two identical planes vanishes (``FastGCStereo.h:479-551``,
    ``StereoEnergy.h:398-453``).

    Args:
      labels_halo: [S+2, S+2, 4] current labels of the window plus a 1-pixel
        halo of *global* labels (margin semantics of ``currentLabeling_m_``).
      proposal: [4] the candidate plane.
      coeff_fwd: [4, S, S] pairwise weights of the forward neighbors at p.
      ox, oy: global coordinates of the window's (0, 0) pixel.
    Returns:
      (cost00, cost01, cost10), each [4, S, S] float32. Entries whose q falls
      outside the S x S window are still computed (from halo labels) but must
      not be used as interior edges; the min-cut kernel masks them.
    """
    s = labels_halo.shape[0] - 2
    lab = labels_halo[1:-1, 1:-1]
    ys = oy + jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    xs = ox + jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    d0_ee_ee = _disp(lab, xs, ys)
    d1_ee = _disp(proposal, xs, ys)

    c00, c01, c10 = [], [], []
    for i, k in enumerate(FORWARD):
        dx, dy = NEIGHBORS[k]
        lab_nb = labels_halo[1 + dy:1 + dy + s, 1 + dx:1 + dx + s]
        xq, yq = xs + dx, ys + dy
        d0_le_ee = _disp(lab_nb, xs, ys)
        d0_ee_le = _disp(lab, xq, yq)
        d0_le_le = _disp(lab_nb, xq, yq)
        d1_le = _disp(proposal, xq, yq)
        w = coeff_fwd[i] * lambda_
        c00.append(jnp.minimum(jnp.abs(d0_ee_ee - d0_le_ee)
                               + jnp.abs(d0_ee_le - d0_le_le), tau) * w)
        # When q switches it holds the proposal plane, so d1_of_le evaluated
        # at p / at q is just the proposal's disparity there.
        c01.append(jnp.minimum(jnp.abs(d0_ee_ee - d1_ee)
                               + jnp.abs(d0_ee_le - d1_le), tau) * w)
        c10.append(jnp.minimum(jnp.abs(d1_ee - d0_le_ee)
                               + jnp.abs(d1_le - d0_le_le), tau) * w)
    return jnp.stack(c00), jnp.stack(c01), jnp.stack(c10)


@functools.partial(jax.jit, static_argnames=("lambda_", "tau"))
def fusion_tables(labels0_halo: jnp.ndarray, labels1_halo: jnp.ndarray,
                  coeff_fwd: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                  lambda_: float, tau: float):
    """Pairwise tables for FUSING two full labelings on one window
    (``computeSmoothnessTermsFusion``, ``StereoEnergy.h:331-394``).

    Unlike expansion, both states are per-pixel labelings, so cost11 is not
    identically zero. Returns (cost00, cost01, cost10, cost11), each
    [4, S, S].
    """
    s = labels0_halo.shape[0] - 2
    lab0 = labels0_halo[1:-1, 1:-1]
    lab1 = labels1_halo[1:-1, 1:-1]
    ys = oy + jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    xs = ox + jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    d0_ee = _disp(lab0, xs, ys)
    d1_ee = _disp(lab1, xs, ys)

    outs = [[], [], [], []]
    for i, k in enumerate(FORWARD):
        dx, dy = NEIGHBORS[k]
        xq, yq = xs + dx, ys + dy
        lab0_nb = labels0_halo[1 + dy:1 + dy + s, 1 + dx:1 + dx + s]
        lab1_nb = labels1_halo[1 + dy:1 + dy + s, 1 + dx:1 + dx + s]
        w = coeff_fwd[i] * lambda_

        def psi(lab_p, d_p_at_p, lab_q):
            d_q_at_p = _disp(lab_q, xs, ys)
            d_p_at_q = _disp(lab_p, xq, yq)
            d_q_at_q = _disp(lab_q, xq, yq)
            return jnp.minimum(jnp.abs(d_p_at_p - d_q_at_p)
                               + jnp.abs(d_p_at_q - d_q_at_q), tau) * w

        outs[0].append(psi(lab0, d0_ee, lab0_nb))
        outs[1].append(psi(lab0, d0_ee, lab1_nb))
        outs[2].append(psi(lab1, d1_ee, lab0_nb))
        outs[3].append(psi(lab1, d1_ee, lab1_nb))
    return tuple(jnp.stack(o) for o in outs)


@functools.partial(jax.jit, static_argnames=("lambda_", "tau"))
def fusion_boundary_tlinks(labels0_halo: jnp.ndarray,
                           labels1_halo: jnp.ndarray,
                           coeff_all: jnp.ndarray, ox: jnp.ndarray,
                           oy: jnp.ndarray, lambda_: float, tau: float):
    """Boundary absorption for the FUSION move (``FastGCStereo.h:440-477``
    semantics with per-pixel proposals): neighbors outside the window keep
    their current (labeling-0) label; the switch state of pixel p takes its
    per-pixel labeling-1 label instead of a shared proposal plane.

    Returns (t0, t1): [S, S] extra costs for keep / switch.
    """
    s = labels0_halo.shape[0] - 2
    lab0 = labels0_halo[1:-1, 1:-1]
    lab1 = labels1_halo[1:-1, 1:-1]
    ys = oy + jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    xs = ox + jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    d0_p = _disp(lab0, xs, ys)
    d1_p = _disp(lab1, xs, ys)

    t0 = jnp.zeros((s, s), jnp.float32)
    t1 = jnp.zeros((s, s), jnp.float32)
    for k, (dx, dy) in enumerate(NEIGHBORS):
        outside = ((ix + dx < 0) | (ix + dx >= s) | (iy + dy < 0)
                   | (iy + dy >= s))
        lab_q = labels0_halo[1 + dy:1 + dy + s, 1 + dx:1 + dx + s]
        xq, yq = xs + dx, ys + dy
        dq_p = _disp(lab_q, xs, ys)
        dq_q = _disp(lab_q, xq, yq)
        d0_q = _disp(lab0, xq, yq)
        d1_q = _disp(lab1, xq, yq)
        w = jnp.where(outside, coeff_all[k], 0.0) * lambda_
        t0 += jnp.minimum(jnp.abs(d0_p - dq_p) + jnp.abs(d0_q - dq_q), tau) * w
        t1 += jnp.minimum(jnp.abs(d1_p - dq_p) + jnp.abs(d1_q - dq_q), tau) * w
    return t0, t1


@functools.partial(jax.jit, static_argnames=("lambda_", "tau"))
def boundary_tlinks(labels_halo: jnp.ndarray, proposal: jnp.ndarray,
                    coeff_all: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                    lambda_: float, tau: float):
    """Unary absorption of pairwise terms against fixed labels outside the
    window (``FastGCStereo.h:440-477``).

    For every window-border pixel p and neighbor q outside the S x S window
    (all 8 directions), the neighbor keeps its current label, so the edge
    contributes ``psi(f_p, cur_q)`` as a unary term on p:
    t0 += psi(cur_p, cur_q) if p keeps, t1 += psi(proposal, cur_q) if p
    switches. Neighbors outside the *image* contribute 0 via the zeroed
    coefficients.

    Args:
      labels_halo: [S+2, S+2, 4] window labels + global halo.
      coeff_all: [8, S, S] weights for all 8 neighbor directions at p.
    Returns:
      (t0, t1): [S, S] extra costs for keep / switch.
    """
    s = labels_halo.shape[0] - 2
    lab = labels_halo[1:-1, 1:-1]
    ys = oy + jax.lax.broadcasted_iota(jnp.float32, (s, s), 0)
    xs = ox + jax.lax.broadcasted_iota(jnp.float32, (s, s), 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    d0_p = _disp(lab, xs, ys)
    d1_p = _disp(proposal, xs, ys)

    t0 = jnp.zeros((s, s), jnp.float32)
    t1 = jnp.zeros((s, s), jnp.float32)
    for k, (dx, dy) in enumerate(NEIGHBORS):
        outside = ((ix + dx < 0) | (ix + dx >= s) | (iy + dy < 0)
                   | (iy + dy >= s))
        lab_q = labels_halo[1 + dy:1 + dy + s, 1 + dx:1 + dx + s]
        xq, yq = xs + dx, ys + dy
        dq_p = _disp(lab_q, xs, ys)
        dq_q = _disp(lab_q, xq, yq)
        d0_q = _disp(lab, xq, yq)
        d1_q = _disp(proposal, xq, yq)
        w = jnp.where(outside, coeff_all[k], 0.0) * lambda_
        t0 += jnp.minimum(jnp.abs(d0_p - dq_p) + jnp.abs(d0_q - dq_q), tau) * w
        t1 += jnp.minimum(jnp.abs(d1_p - dq_p) + jnp.abs(d1_q - dq_q), tau) * w
    return t0, t1
