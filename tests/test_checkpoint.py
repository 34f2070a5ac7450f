"""Checkpoint/resume and warm-start tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models import engine as engine_mod
from localexpstereo_tpu.models.engine import LocalExpansionSolver
from localexpstereo_tpu.utils import checkpoint as ckpt_mod


def _pair():
    rng = np.random.default_rng(3)
    h, w = 24, 32
    base = rng.random((h, w + 8, 3)).astype(np.float32) * 255
    return base[:, 0:w], base[:, 3:3 + w]


def _solver():
    im0, im1 = _pair()
    s = LocalExpansionSolver(im0, im1, PARAMS_GF.replace(windR=4),
                             max_disp=7.0, seed=0)
    s.add_layer(4, ("expansion", "ransac"))
    return s


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "state.npz")
    state = {0: (jnp.ones((10, 12, 4)), jnp.full((10, 12), 2.0))}
    ckpt_mod.save_checkpoint(path, state, seed=7, pm_done=1, gc_done=2,
                             pad=3)
    ck = ckpt_mod.load_checkpoint(path)
    assert ck.seed == 7 and ck.pm_iterations_done == 1
    assert ck.iterations_done == 2 and ck.pad == 3
    np.testing.assert_array_equal(ck.labeling[0], np.ones((10, 12, 4)))
    np.testing.assert_array_equal(ck.cost[0], np.full((10, 12), 2.0))


def test_resume_matches_uninterrupted(tmp_path):
    path = str(tmp_path / "ck.npz")
    s1 = _solver()
    lab_full, _ = s1.run(iterations=2, view_modes=(0,), pm_iterations=0)

    s2 = _solver()
    s2.run(iterations=1, view_modes=(0,), pm_iterations=0,
           checkpoint_path=path, checkpoint_every=1)
    s3 = _solver()
    lab_resumed, _ = s3.run(iterations=2, view_modes=(0,), pm_iterations=0,
                            resume_from=path)
    np.testing.assert_array_equal(np.asarray(lab_full),
                                  np.asarray(lab_resumed))


def test_warm_start_exact_with_unfiltered_energy():
    """With filtering disabled (filter_name=""), warm-start unary is the raw
    truncated volume sample at each pixel's own plane — exactly checkable.
    (With a guided filter the values depend on the filter-crop geometry, as
    in the reference: a 1px-target crop and a region crop legitimately
    differ near crop borders, GuidedFilter.h:298-300.)"""
    rng = np.random.default_rng(5)
    h, w, nd = 10, 14, 8
    im = (rng.random((h, w, 3)) * 255).astype(np.float32)
    vol = rng.random((nd, h, w)).astype(np.float32)
    params = PARAMS_GF.replace(windR=4, filter_name="", th_col=0.9)
    # vol_dtype f32: the default bf16 storage quantizes the volume (~0.3%),
    # which this exactness oracle cannot tolerate.
    s = LocalExpansionSolver(im, im, params, max_disp=float(nd - 1),
                             vol0=vol, vol1=vol, seed=0,
                             vol_dtype="float32")
    s.add_layer(4, ("expansion",))
    s.finalize()

    lab = np.zeros((h, w, 4), np.float32)
    lab[..., 2] = rng.uniform(0.5, nd - 1.5, (h, w))  # fronto-parallel
    lab_m, cost_m = engine_mod.init_from_labeling(s.data, s.cfg, lab, 0,
                                                  chunk=64)
    p = s.cfg.pad
    got = np.asarray(cost_m[p:p + h, p:p + w])

    d = lab[..., 2]
    d0 = np.floor(d).astype(int)
    f1 = d - d0
    ys, xs = np.mgrid[0:h, 0:w]
    want = ((1 - f1) * vol[d0, ys, xs]
            + f1 * vol[np.minimum(d0 + 1, nd - 1), ys, xs])
    want = np.minimum(want, 0.9)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warm_start_then_gc_energy_monotone():
    s = _solver()
    im0, im1 = _pair()
    h, w = im0.shape[:2]
    lab = np.zeros((h, w, 4), np.float32)
    lab[..., 2] = 3.0
    lab_final, _ = s.run(iterations=1, view_modes=(0,), pm_iterations=0,
                         init_labeling=lab)
    assert np.isfinite(np.asarray(lab_final)).all()
