"""Post-processing oracles: consistency check, hole fill, weighted median."""
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.models import postprocess
from localexpstereo_tpu.ops import plane as plane_ops


def _naive_consistency(disp_l, disp_r, thr):
    """Mirror of PMStereoBase::doConsistencyCheck (PMStereoBase.h:111-144)."""
    h, w = disp_l.shape
    fails = []
    for i, (da, db, sign) in enumerate([(disp_l, disp_r, 1.0),
                                        (disp_r, disp_l, -1.0)]):
        fail = np.zeros((h, w), np.uint8)
        for y in range(h):
            for x in range(w):
                ds = da[y, x]
                rx = int(np.floor(x - ds * sign + 0.5))
                if 0 <= rx < w:
                    if abs(db[y, rx] - ds) > thr:
                        fail[y, x] = 255
                else:
                    fail[y, x] = 128
        fails.append(fail)
    return fails


def test_consistency_check_vs_naive():
    rng = np.random.default_rng(0)
    h, w = 12, 20
    disp_l = (rng.random((h, w)) * 8).astype(np.float32)
    disp_r = (rng.random((h, w)) * 8).astype(np.float32)
    fl, fr = postprocess.consistency_check(jnp.asarray(disp_l),
                                           jnp.asarray(disp_r), 1.5)
    nl, nr = _naive_consistency(disp_l, disp_r, 1.5)
    np.testing.assert_array_equal(np.asarray(fl), nl)
    np.testing.assert_array_equal(np.asarray(fr), nr)


def test_fill_holes_takes_lower_disparity_side():
    """A failed run bounded by valid pixels adopts the side with the LOWER
    plane disparity at the pixel (background bias; PMStereoBase.h:193-199)."""
    h, w = 3, 9
    lab = np.zeros((h, w, 4), np.float32)
    lab[:, :, 2] = 5.0          # left side: constant disparity 5
    lab[:, 6:, 2] = 2.0         # right side: constant disparity 2
    fail = np.zeros((h, w), bool)
    fail[:, 3:6] = True
    fail2 = np.zeros((h, w), bool)
    fail2[:, 2:7] = True        # dilated
    out = np.asarray(postprocess.fill_holes(jnp.asarray(lab),
                                            jnp.asarray(fail),
                                            jnp.asarray(fail2)))
    # Right side disparity (2) < left side (5) -> failed pixels take right.
    np.testing.assert_allclose(out[:, 3:6, 2], 2.0)
    # Non-failed pixels unchanged.
    np.testing.assert_allclose(out[:, :3], lab[:, :3])


def test_fill_holes_one_side_missing():
    h, w = 2, 6
    lab = np.zeros((h, w, 4), np.float32)
    lab[:, :, 2] = 7.0
    fail = np.zeros((h, w), bool)
    fail[:, 0:2] = True
    fail2 = np.zeros((h, w), bool)
    fail2[:, 0:3] = True        # no valid pixel to the left
    out = np.asarray(postprocess.fill_holes(jnp.asarray(lab),
                                            jnp.asarray(fail),
                                            jnp.asarray(fail2)))
    np.testing.assert_allclose(out[:, 0:2, 2], 7.0)  # filled from the right


def test_weighted_median_picks_weighted_middle():
    """Uniform guide -> uniform weights -> plain median of patch disparities."""
    rng = np.random.default_rng(1)
    h, w = 9, 9
    lab = np.zeros((h, w, 4), np.float32)
    vals = rng.permutation(h * w).astype(np.float32).reshape(h, w)
    lab[..., 2] = vals          # fronto-parallel planes, d = c everywhere
    img = np.ones((h, w, 3), np.float32) * 100
    fail = np.zeros((h, w), bool)
    fail[4, 4] = True
    out = postprocess.weighted_median_at(lab, img, fail, wind_r=4,
                                         omega=10.0)
    # Patch covers the whole 9x9 image; median of 0..80 is 40.
    assert out[4, 4, 2] == pytest.approx(np.median(vals))


def test_weighted_median_respects_weights():
    """Center-similar pixels dominate: the median must follow the heavily
    weighted half."""
    h, w = 1, 7
    lab = np.zeros((h, w, 4), np.float32)
    lab[0, :, 2] = [1, 1, 1, 9, 9, 9, 9]
    img = np.zeros((h, w, 3), np.float32)
    img[0, :3] = 200            # dissimilar to center (weight ~ 0)
    img[0, 3:] = 10             # similar to center
    fail = np.zeros((h, w), bool)
    fail[0, 3] = True
    out = postprocess.weighted_median_at(lab, img, fail, wind_r=3,
                                         omega=10.0)
    assert out[0, 3, 2] == pytest.approx(9.0)


def _random_dual_case(seed, h=14, w=22, nd=8.0):
    """A noisy dual-view pair with genuine consistency failures."""
    rng = np.random.default_rng(seed)
    def lab(d):
        out = np.zeros((h, w, 4), np.float32)
        out[..., 0] = rng.uniform(-0.05, 0.05, (h, w))
        out[..., 1] = rng.uniform(-0.05, 0.05, (h, w))
        out[..., 2] = d
        return out
    d_l = np.clip(rng.normal(nd / 2, nd / 4, (h, w)), 0, nd).astype(np.float32)
    d_r = np.clip(d_l + rng.normal(0, 1.2, (h, w)), 0, nd).astype(np.float32)
    im0 = (rng.random((h, w, 3)) * 255).astype(np.float32)
    im1 = (rng.random((h, w, 3)) * 255).astype(np.float32)
    return lab(d_l), lab(d_r), im0, im1


def test_post_process_fixed_matches_host_path():
    """The static-capacity traced postprocess (deployment path) must equal
    the host `post_process` exactly whenever the failed count fits the cap."""
    from localexpstereo_tpu.config import PARAMS_GF
    params = PARAMS_GF.replace(windR=4)
    lab_l, lab_r, im0, im1 = _random_dual_case(3)
    ref_l, ref_r = postprocess.post_process(
        jnp.asarray(lab_l), jnp.asarray(lab_r), im0, im1, params,
        threshold=1.0)
    got_l, got_r, nl, nr, cap = postprocess.post_process_fixed(
        jnp.asarray(lab_l), jnp.asarray(lab_r), im0, im1, params,
        threshold=1.0, fail_cap=448, chunk=64)
    assert int(nl) > 0 and int(nl) <= cap and int(nr) <= cap
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(ref_r))


def test_post_process_batched_matches_per_pair():
    """vmapped batch tail == per-pair host post_process for every pair."""
    from localexpstereo_tpu.config import PARAMS_GF
    params = PARAMS_GF.replace(windR=3)
    cases = [_random_dual_case(s) for s in (7, 11, 13)]
    labs_l = np.stack([c[0] for c in cases])
    labs_r = np.stack([c[1] for c in cases])
    ims0 = np.stack([c[2] for c in cases])
    ims1 = np.stack([c[3] for c in cases])
    ll, lr, nl, nr, cap = postprocess.post_process_batched(
        jnp.asarray(labs_l), jnp.asarray(labs_r), ims0, ims1, params,
        threshold=1.0, fail_cap=448, chunk=64)
    assert int(np.max(np.asarray(nl))) <= cap
    for b, (al, ar, i0, i1) in enumerate(cases):
        ref_l, ref_r = postprocess.post_process(
            jnp.asarray(al), jnp.asarray(ar), i0, i1, params, threshold=1.0)
        np.testing.assert_array_equal(np.asarray(ll[b]), np.asarray(ref_l))
        np.testing.assert_array_equal(np.asarray(lr[b]), np.asarray(ref_r))


def test_post_process_fixed_overflow_reports_count():
    """When n_fail exceeds the cap, the count must reveal it (callers fall
    back to the host path) and uncapped pixels keep hole-filled labels."""
    from localexpstereo_tpu.config import PARAMS_GF
    params = PARAMS_GF.replace(windR=3)
    lab_l, lab_r, im0, im1 = _random_dual_case(17)
    _, _, nl, nr, cap = postprocess.post_process_fixed(
        jnp.asarray(lab_l), jnp.asarray(lab_r), im0, im1, params,
        threshold=0.05, fail_cap=8, chunk=8)   # tiny cap, huge fail set
    assert cap == 8
    assert int(nl) > cap or int(nr) > cap


def test_post_process_end_to_end_consistent_pair_is_noop():
    """A perfectly consistent fronto-parallel pair has no failed pixels, so
    post-processing must leave the labelings untouched."""
    h, w = 10, 16
    d = 3.0
    lab_l = np.zeros((h, w, 4), np.float32)
    lab_l[..., 2] = d
    lab_r = np.zeros((h, w, 4), np.float32)
    lab_r[..., 2] = d
    im = np.ones((h, w, 3), np.float32) * 50
    out_l, out_r = postprocess.post_process(
        jnp.asarray(lab_l), jnp.asarray(lab_r), im, im,
        __import__("localexpstereo_tpu.config", fromlist=["PARAMS_GF"]
                   ).PARAMS_GF,
        threshold=1.0)
    np.testing.assert_allclose(np.asarray(out_l), lab_l)
    np.testing.assert_allclose(np.asarray(out_r), lab_r)
