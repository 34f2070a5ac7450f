"""Video-rate serving mode (StereoStream warm-start path)."""
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.serving import StereoStream


def _problem(seed, h=48, w=72, nd=12):
    """Piecewise-slanted-plane scene + quadratic-basin matching volume."""
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    truth = np.zeros((h, w), np.float32)
    for _ in range(4):
        a = rng.uniform(-0.1, 0.1)
        b = rng.uniform(-0.1, 0.1)
        c = rng.uniform(2, nd - 3)
        m = (xs - rng.integers(0, w)) ** 2 + \
            (ys - rng.integers(0, h)) ** 2 < (w // 2) ** 2
        truth[m] = np.clip(a * xs + b * ys + c, 1, nd - 2)[m]
    d = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.minimum((d - truth[None]) ** 2 * 0.2, 1.0).astype(np.float32)
    return img, vol, truth


def _bad1(disp, truth):
    return float((np.abs(disp - truth) > 1.0).mean())


@pytest.mark.slow
def test_stream_warm_start_preserves_quality():
    """Frame 2 on the SAME scene with 1 warm GC sweep must match the cold
    frame's quality (the warm start carries the solution over)."""
    img, vol, truth = _problem(0)
    params = PARAMS_GF.replace(windR=6, lambda_=0.5, th_col=0.5)
    stream = StereoStream(params, max_disp=float(vol.shape[0] - 1),
                          unit_sizes=[4, 8], cold_iterations=2,
                          cold_pm_iterations=1, warm_iterations=1)
    d0 = stream.process(img, img, vol, vol)
    b0 = _bad1(d0, truth)
    d1 = stream.process(img, img, vol, vol)
    b1 = _bad1(d1, truth)
    assert np.isfinite(d1).all()
    assert b1 <= b0 + 0.02, f"warm frame regressed: {b1:.3f} vs {b0:.3f}"


@pytest.mark.slow
def test_stream_adapts_to_scene_change():
    """A changed scene must pull the warm-started solution toward the new
    truth (warm start must not pin the old solution)."""
    img0, vol0, truth0 = _problem(1)
    img1, vol1, truth1 = _problem(2)
    params = PARAMS_GF.replace(windR=6, lambda_=0.5, th_col=0.5)
    stream = StereoStream(params, max_disp=float(vol0.shape[0] - 1),
                          unit_sizes=[4, 8], cold_iterations=2,
                          cold_pm_iterations=1, warm_iterations=2)
    stream.process(img0, img0, vol0, vol0)
    d1 = stream.process(img1, img1, vol1, vol1)
    # Closer to the new truth than to the old scene's.
    err_new = np.abs(d1 - truth1).mean()
    err_old = np.abs(d1 - truth0).mean()
    assert err_new < err_old


def test_update_frame_matches_fresh_solver():
    """update_frame (the persistent-solver serving fast path) must be
    bit-equal to building a fresh solver on the new frame's tensors: both
    run the same executables on what must be the same EnergyData."""
    import jax.numpy as jnp
    from localexpstereo_tpu.models.engine import LocalExpansionSolver

    imgA, volA, _ = _problem(4)
    imgB, volB, _ = _problem(5)
    params = PARAMS_GF.replace(windR=6, lambda_=0.5, th_col=0.5)
    nd = float(volA.shape[0] - 1)

    fresh = LocalExpansionSolver(imgB, imgB, params, nd, vol0=volB,
                                 vol1=volB, seed=9,
                                 stats_backend="device")
    fresh.add_layer(4, ("expansion", "ransac"))
    labF, _ = fresh.run(iterations=1, view_modes=(0,), pm_iterations=1)

    upd = LocalExpansionSolver(imgA, imgA, params, nd, vol0=volA,
                               vol1=volA, seed=0, stats_backend="device")
    upd.add_layer(4, ("expansion", "ransac"))
    upd.run(iterations=1, view_modes=(0,), pm_iterations=0)  # frame A solve
    upd.update_frame(jnp.asarray(imgB), jnp.asarray(imgB),
                     jnp.asarray(volB), jnp.asarray(volB), seed=9)
    labU, _ = upd.run(iterations=1, view_modes=(0,), pm_iterations=1)

    np.testing.assert_array_equal(labF, labU)


def test_pipelined_stream_matches_sync():
    """pipelined=True shifts outputs by one frame (None first, flush()
    drains the last) and every disparity bitwise-matches the synchronous
    stream — the async D2H overlap must not change results."""
    img, vol, _ = _problem(3)
    params = PARAMS_GF.replace(windR=6, lambda_=0.5, th_col=0.5)
    kw = dict(max_disp=float(vol.shape[0] - 1), unit_sizes=[4],
              cold_iterations=1, cold_pm_iterations=1, warm_iterations=1)
    sync = StereoStream(params, **kw)
    pipe = StereoStream(params, **kw, pipelined=True)
    outs_sync = [sync.process(img, img, vol, vol) for _ in range(3)]
    outs_pipe = [pipe.process(img, img, vol, vol) for _ in range(3)]
    assert outs_pipe[0] is None
    np.testing.assert_array_equal(outs_pipe[1], outs_sync[0])
    np.testing.assert_array_equal(outs_pipe[2], outs_sync[1])
    np.testing.assert_array_equal(pipe.flush(), outs_sync[2])
    assert pipe.flush() is None
    # reset() drops both the warm-start state and the pending transfer,
    # recovering the cold path (same executables — free to check here).
    pipe.reset()
    assert pipe._prev_labeling is None and pipe._pending_disp is None
    d = pipe.process(img, img, vol, vol)
    assert d is None          # pipelined first frame after reset
    # The frame counter (and so the per-frame seed) keeps advancing across
    # reset, so the result differs from frame 0 — just require a sane map.
    assert np.isfinite(pipe.flush()).all()
