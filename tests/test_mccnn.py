"""MC-CNN cost-volume network tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.models import mccnn


def test_cost_volume_shapes_and_range():
    key = jax.random.PRNGKey(0)
    params = mccnn.init_params(key, channels=(8, 8))
    rng = np.random.default_rng(0)
    im0 = (rng.random((20, 28, 3)) * 255).astype(np.float32)
    im1 = (rng.random((20, 28, 3)) * 255).astype(np.float32)
    vol = np.asarray(mccnn.cost_volume(params, jnp.asarray(im0),
                                       jnp.asarray(im1), ndisp=6))
    assert vol.shape == (6, 20, 28)
    # cosine costs live in [0, 2]
    assert vol.min() >= -1e-4 and vol.max() <= 2.0 + 1e-4


def test_identical_images_zero_disparity_minimum():
    """For identical views, d=0 must give (near-)zero cost — the global
    minimum over d for most pixels."""
    key = jax.random.PRNGKey(1)
    params = mccnn.init_params(key, channels=(8, 8))
    rng = np.random.default_rng(1)
    im = (rng.random((16, 24, 3)) * 255).astype(np.float32)
    vol = np.asarray(mccnn.cost_volume(params, jnp.asarray(im),
                                       jnp.asarray(im), ndisp=5))
    np.testing.assert_allclose(vol[0], 0.0, atol=1e-4)
    assert (vol[0] <= vol[1:].min(0) + 1e-4).mean() > 0.95


def test_shifted_image_recovers_disparity():
    """im1 = im0 shifted right by 3 -> cost minimum at d=3 for valid x."""
    key = jax.random.PRNGKey(2)
    params = mccnn.init_params(key)
    rng = np.random.default_rng(2)
    base = (rng.random((18, 40, 3)) * 255).astype(np.float32)
    im0 = base
    # vol[d] matches im0(x) with im1(x - d); with im1(x) = im0(x + 3) the
    # match is exact at d = 3.
    im1 = np.roll(base, -3, axis=1)
    vol = np.asarray(mccnn.cost_volume(params, jnp.asarray(im0),
                                       jnp.asarray(im1), ndisp=8))
    best = vol.argmin(0)
    interior = best[4:-4, 10:-10]
    assert (interior == 3).mean() > 0.9


def test_params_roundtrip(tmp_path):
    params = mccnn.init_params(jax.random.PRNGKey(3), channels=(4,))
    p = str(tmp_path / "w.npz")
    mccnn.save_params(p, params)
    back = mccnn.load_params(p)
    for k in params:
        np.testing.assert_array_equal(np.asarray(params[k]),
                                      np.asarray(back[k]))


def test_volume_feeds_solver():
    """End-to-end: network volume -> local expansion solver."""
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import LocalExpansionSolver
    key = jax.random.PRNGKey(4)
    params_net = mccnn.init_params(key, channels=(8, 8))
    rng = np.random.default_rng(4)
    base = (rng.random((24, 40, 3)) * 255).astype(np.float32)
    im0 = base[:, 0:32]
    im1 = base[:, 4:36]
    nd = 8
    vol0 = np.asarray(mccnn.cost_volume(params_net, jnp.asarray(im0),
                                        jnp.asarray(im1), ndisp=nd))
    from localexpstereo_tpu.utils import acrt
    vol1 = acrt.convert_volume_l2r(vol0)
    solver = LocalExpansionSolver(
        im0, im1, PARAMS_GF.replace(windR=4, th_col=0.5),
        max_disp=float(nd - 1), vol0=vol0, vol1=vol1, seed=0)
    solver.add_layer(4, ("expansion", "ransac"))
    lab, _ = solver.run(iterations=1, view_modes=(0,), pm_iterations=1)
    assert np.isfinite(np.asarray(lab)).all()


def test_default_weights_load():
    """The bundled trained weights load and have the fast-MC-CNN shape."""
    params = mccnn.load_default_params()
    assert mccnn.num_layers(params) == 4
    assert params["w0"].shape == (3, 3, 3, 32)
    assert params["w3"].shape == (3, 3, 64, 64)


@pytest.mark.slow
def test_trained_weights_drive_solver_on_tsukuba_crop():
    """BASELINE config 5 regression: the TRAINED weights' on-device volume
    must drive the solver to a sane disparity map on real data (a tsukuba
    crop; the full-image CLI run reaches bad1.0 nonocc ~4.2% after 1 pm +
    2 GC sweeps)."""
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import LocalExpansionSolver
    from localexpstereo_tpu.ops import plane as plane_ops
    from localexpstereo_tpu.utils import acrt, datasets

    pair = datasets.load_data("/root/reference/data/MiddV2/tsukuba", 0)
    y0, y1, x0, x1 = 96, 224, 128, 320
    im0 = pair.im0[y0:y1, x0:x1]
    im1 = pair.im1[y0:y1, x0:x1]
    gt = pair.disp_gt[y0:y1, x0:x1]
    nonocc = pair.nonocc[y0:y1, x0:x1]

    params_net = mccnn.load_default_params()
    vol0 = np.asarray(mccnn.cost_volume(
        params_net, jnp.asarray(im0), jnp.asarray(im1), ndisp=pair.ndisp))
    vol1 = acrt.fill_out_of_view(acrt.convert_volume_l2r(vol0), 1)

    solver = LocalExpansionSolver(
        im0, im1, PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5),
        max_disp=float(pair.ndisp - 1), vol0=vol0, vol1=vol1, seed=0)
    for sz in (3, 11, 17):
        solver.add_layer(sz, ("expansion", "ransac"))
    lab, _ = solver.run(iterations=2, view_modes=(0,), pm_iterations=1)

    disp = np.asarray(plane_ops.disparity_map(jnp.asarray(lab)))
    valid = nonocc & np.isfinite(gt) & (gt > 0)
    # Pixels within ndisp of the crop's left edge have no true match inside
    # the cropped right view (crop-induced occlusion the full-image nonocc
    # mask cannot know about) — exclude them from scoring.
    valid[:, :pair.ndisp + 1] = False
    bad1 = 100.0 * (np.abs(disp - gt)[valid] > 1.0).mean()
    assert bad1 < 12.0, f"bad1.0 nonocc {bad1:.2f}% on tsukuba crop"
