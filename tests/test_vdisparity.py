"""V2 vertical-disparity (``max_vdisp > 0``) validation.

The reference supports a per-plane vertical offset ``v`` (``Plane.h:4-8``):
the V2 warp samples the other view at ``(x - sign*d, y + v)``
(``StereoEnergy.h:720-725``) and the random proposer perturbs ``v``
(``Proposer.h:135-141``). The demo passes ``vdisp = 0`` so the reference
never pins behavior; these tests validate the capability directly:

1. oracle: on a synthetically (d0, v0)-shifted pair, the warp cost at the
   TRUE (d0, v0) is near zero and strictly below the v = 0 cost;
2. end-to-end: a solve with ``max_vdisp > 0`` recovers median v ~= v0
   (the round-2 probe this replaces was inconclusive; the oracle isolates
   the data term from the proposal schedule).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import LocalExpansionSolver
from localexpstereo_tpu.ops import plane as plane_ops
from localexpstereo_tpu.ops import unary_warp

D0, V0 = 4.0, 2.0
H, W = 48, 64


def _pair(seed=0):
    """im1(x - D0, y + V0) == im0(x, y) exactly (integer shifts)."""
    rng = np.random.default_rng(seed)
    m = 8
    base = rng.random((H + 2 * m, W + 2 * m, 3)).astype(np.float32) * 255
    # Box-blur so bilinear resampling off-lattice stays benign.
    for _ in range(2):
        base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)
                + np.roll(base, 1, (0, 1))) / 4.0
    i0, j0 = m, m
    im0 = base[i0:i0 + H, j0:j0 + W]
    iv, jv = int(V0), int(D0)
    im1 = base[i0 - iv:i0 - iv + H, j0 + jv:j0 + jv + W]
    return im0.copy(), im1.copy()


def test_v_term_lowers_cost_at_truth():
    im0, im1 = _pair()
    alpha = PARAMS_GF.alpha
    exi0 = jnp.asarray(unary_warp.build_feature_image(im0, alpha))
    exi1 = jnp.asarray(unary_warp.build_feature_image(im1, alpha))

    size = 16
    ox = jnp.asarray([20], jnp.int32)
    oy = jnp.asarray([12], jnp.int32)

    def cost_at(d, v):
        props = jnp.asarray([[0.0, 0.0, d, v]], jnp.float32)
        c = unary_warp.sample_windows(
            exi0, exi1, props, ox, oy, size, 1.0,
            PARAMS_GF.th_col, PARAMS_GF.th_grad, alpha)
        return float(jnp.mean(c))

    c_true = cost_at(D0, V0)
    c_v0 = cost_at(D0, 0.0)
    c_wrongv = cost_at(D0, -V0)
    assert c_true < 1e-3, f"true (d, v) should match exactly, got {c_true}"
    assert c_true < 0.2 * c_v0, (c_true, c_v0)
    assert c_true < 0.2 * c_wrongv, (c_true, c_wrongv)
    # v resolution is sub-pixel: half-pixel error already costs more.
    assert c_true < cost_at(D0, V0 + 0.5)


@pytest.mark.slow
def test_end_to_end_recovers_v():
    im0, im1 = _pair()
    params = PARAMS_GF.replace(windR=6, lambda_=0.5)
    solver = LocalExpansionSolver(im0, im1, params, max_disp=8.0,
                                  max_vdisp=3.0, seed=1)
    solver.add_layer(6, ("expansion", "ransac", "random7"))
    labeling, _ = solver.run(iterations=3, view_modes=(0,), pm_iterations=2)

    inner = labeling[8:-8, 8:-8]
    disp = np.asarray(plane_ops.disparity_map(jnp.asarray(inner)))
    med_d = float(np.median(disp))
    med_v = float(np.median(inner[..., 3]))
    assert abs(med_d - D0) < 0.5, f"median disparity {med_d} != {D0}"
    assert abs(med_v - V0) < 0.5, f"median v {med_v} != {V0}"


@pytest.mark.slow
def test_v_zero_runs_unchanged():
    """max_vdisp == 0 keeps v identically zero (slab fast path)."""
    im0, im1 = _pair()
    params = PARAMS_GF.replace(windR=6, lambda_=0.5)
    solver = LocalExpansionSolver(im0, im1, params, max_disp=8.0, seed=1)
    solver.add_layer(6, ("expansion", "ransac", "random7"))
    labeling, _ = solver.run(iterations=1, view_modes=(0,), pm_iterations=1)
    assert np.all(labeling[..., 3] == 0.0)
