"""Evaluator integration: log rows, bad-pixel math, GT quantization,
timer pause semantics, consistency snapshots."""
import os

import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import LocalExpansionSolver
from localexpstereo_tpu.models.evaluator import Evaluator


def _pair_with_gt():
    rng = np.random.default_rng(7)
    h, w, d = 20, 28, 3
    base = rng.random((h, w + 8, 3)).astype(np.float32) * 255
    im0, im1 = base[:, 0:w], base[:, d:d + w]
    gt = np.full((h, w), float(d), np.float32)
    nonocc = np.ones((h, w), bool)
    return im0, im1, gt, nonocc


def test_evaluator_runs_through_solver(tmp_path):
    im0, im1, gt, nonocc = _pair_with_gt()
    ev = Evaluator(gt, nonocc, disparity_factor=255.0 / 7,
                   save_dir=str(tmp_path), print_progress=False)
    ev.set_error_threshold(0.5)
    ev.set_precision(-1.0)

    s = LocalExpansionSolver(im0, im1, PARAMS_GF.replace(windR=4),
                             max_disp=7.0, seed=0)
    s.add_layer(4, ("expansion", "ransac"))
    s.set_evaluator(ev)
    s.run(iterations=1, view_modes=(0,), pm_iterations=1)
    ev.close()

    rows = open(os.path.join(str(tmp_path),
                             "log_output.txt")).read().splitlines()
    # header + init + 1 greedy + 1 GC
    assert rows[0].split("\t") == ["Time", "Eng", "Data", "Smooth", "all",
                                   "nonocc"]
    assert len(rows) == 4
    # energy column monotone from the greedy row to the GC row
    eng = [float(r.split("\t")[1]) for r in rows[1:]]
    assert eng[2] <= eng[1] + 1e-2
    # bad-pixel rate should improve from the random init
    bad = [float(r.split("\t")[4]) for r in rows[1:]]
    assert bad[2] <= bad[0]
    # debug images written (cv2 available in this env)
    assert any(f.startswith("result0D") for f in os.listdir(str(tmp_path)))
    # timer paused during evaluation: final accumulated time is finite, small
    assert 0.0 <= ev.get_current_time() < 1e4


def test_gt_quantization_rounds_to_nearest(tmp_path):
    """Quantization must ROUND to the nearest quantum, not truncate: the
    reference's quantize() is convertTo(CV_32S) = cvRound (Evaluator.h:106-111).
    E.g. disp 3.15 at precision 0.25 -> 3.25 (trunc would give 3.0)."""
    gt = np.full((4, 4), 3.25, np.float32)
    ev = Evaluator(gt, np.ones((4, 4), bool), disparity_factor=255.0 / 7,
                   save_dir=str(tmp_path), print_progress=False)
    ev.set_precision(0.25)
    disp = np.full((4, 4), 3.15, np.float32)
    q = np.rint(disp / ev.qprecision) * ev.qprecision
    np.testing.assert_allclose(q, 3.25)
    # and the evaluate() path itself uses the rounding flavor: a labeling
    # whose disparity is 3.15 must score 0% bad at threshold 0.01 vs GT 3.25.
    lab = np.zeros((4, 4, 4), np.float32)
    lab[..., 2] = 3.15

    class _Cfg:
        height = 4
        width = 4
        pad = 0

    class _Solver:
        cfg = _Cfg()
        data = None

    ev.set_error_threshold(0.01)
    ev.save_progress = False

    import jax.numpy as jnp
    import localexpstereo_tpu.models.engine as engine_mod
    orig = engine_mod.energy_audit
    engine_mod.energy_audit = lambda *a, **k: (0.0, 0.0, 0.0)
    try:
        ev.evaluate(_Solver(), jnp.asarray(lab), jnp.zeros((4, 4)), mode=0,
                    index=0)
    finally:
        engine_mod.energy_audit = orig
    assert ev.last_accuracy == 0.0
    ev.close()


def test_show_writes_live_previews(tmp_path):
    """show=True is the headless cv::imshow (Evaluator.h:145-160): every
    evaluation overwrites live_D.png / live_E.png in save_dir."""
    cv2 = pytest.importorskip("cv2")
    im0, im1, gt, nonocc = _pair_with_gt()
    ev = Evaluator(gt, nonocc, disparity_factor=255.0 / 7,
                   save_dir=str(tmp_path), print_progress=False,
                   show=True, save=False)
    s = LocalExpansionSolver(im0, im1, PARAMS_GF.replace(windR=4),
                             max_disp=7.0, seed=0)
    s.add_layer(5, ("expansion", "ransac"))
    s.set_evaluator(ev)
    s.run(iterations=1, view_modes=(0,), pm_iterations=0)
    d = os.path.join(str(tmp_path), "live_D.png")
    e = os.path.join(str(tmp_path), "live_E.png")
    assert os.path.exists(d) and os.path.exists(e)
    assert cv2.imread(d).shape[:2] == gt.shape
