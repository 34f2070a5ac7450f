"""CLI surface and evaluator-output tests."""
import os

import numpy as np
import pytest

from localexpstereo_tpu.cli import main as cli
from localexpstereo_tpu.models.evaluator import Evaluator


def test_reference_flag_spelling_and_single_dash():
    opt = cli.parse_args(["-mode", "MiddV2", "-targetDir", "/x",
                          "-outputDir", "/y", "-doDual", "1",
                          "-iterations", "3", "-pmIterations", "1",
                          "-ndisp", "64", "-smooth_weight", "0.5",
                          "-filterRadious", "10", "-mc_threshold", "0.3",
                          "-threadNum", "4"])
    assert opt.mode == "MiddV2" and opt.do_dual
    assert opt.iterations == 3 and opt.pm_iterations == 1
    assert opt.ndisp == 64 and opt.filter_radius == 10
    assert opt.smooth_weight == 0.5 and opt.mc_threshold == 0.3
    assert opt.thread_num == 4


def test_double_dash_and_alias():
    opt = cli.parse_args(["--mode", "MiddV3", "--filterRadius", "12"])
    assert opt.mode == "MiddV3" and opt.filter_radius == 12


def test_mode_presets():
    assert cli.parse_args(["-mode", "MiddV3"]).resolve_smooth_weight() == 0.5
    assert cli.parse_args(["-mode", "MiddV2"]).resolve_smooth_weight() == 1.0
    # CLI override wins over the preset (main.cpp order).
    assert cli.parse_args(["-mode", "MiddV3", "-smooth_weight", "2.0"]
                          ).resolve_smooth_weight() == 2.0


def test_main_usage_fallback(capsys):
    assert cli.main([]) == 1
    out = capsys.readouterr().out
    assert "-mode [MiddV2, MiddV3]" in out


def test_evaluator_log_format(tmp_path):
    gt = np.full((8, 10), 3.0, np.float32)
    nonocc = np.ones((8, 10), bool)
    ev = Evaluator(gt, nonocc, disparity_factor=255.0 / 7,
                   save_dir=str(tmp_path), print_progress=False)
    ev.set_error_threshold(0.5)

    class FakeCfg:
        pad = 2
        height = 8
        width = 10

    # evaluate() needs a solver; exercise only the log plumbing via the
    # private writer by closing and checking the header row.
    ev.close()
    text = open(os.path.join(str(tmp_path), "log_output.txt")).read()
    assert text.splitlines()[0] == "Time\tEng\tData\tSmooth\tall\tnonocc"


@pytest.mark.slow
def test_midv3_end_to_end_acrt(tmp_path):
    """Full MidV3 driver on a synthetic dataset: .acrt volume (threaded
    native loader path incl. L->R recovery), 1%/3%/9% layers, evaluator
    log, disp0.pfm — and the solver recovers the planted disparity."""
    import cv2

    from localexpstereo_tpu.utils import acrt, pfm

    rng = np.random.default_rng(0)
    h, w, nd = 60, 120, 16
    target = tmp_path / "scene"
    target.mkdir()
    im = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(target / "im0.png"), im)
    cv2.imwrite(str(target / "im1.png"), im)
    with open(target / "calib.txt", "w") as f:
        f.write(f"width={w}\nheight={h}\nndisp={nd}\n")

    # Planted slanted-plane truth + quadratic-basin volume.
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    truth = np.clip(0.05 * xs + 0.02 * ys + 3.0, 1, nd - 2)
    d = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.minimum((d - truth[None]) ** 2 * 0.2, 1.0).astype(np.float32)
    acrt.write_acrt(str(target / "im0.acrt"), vol)

    out = tmp_path / "out"
    rc = cli.main(["-mode", "MiddV3", "-targetDir", str(target),
                   "-outputDir", str(out), "-iterations", "2",
                   "-pmIterations", "1", "-seed", "0"])
    assert rc == 0

    disp = pfm.read_pfm(str(out / "disp0.pfm"))
    assert disp.shape == (h, w)
    # interior recovery (borders lack volume support)
    err = np.abs(disp - truth)[8:-8, nd:-8]
    assert np.median(err) < 0.5
    assert (err < 1.0).mean() > 0.8

    rows = open(out / "debug" / "log_output.txt").read().strip().splitlines()
    eng = [float(r.split("\t")[1]) for r in rows[1:]]
    assert eng[2] <= eng[1] and eng[3] <= eng[2]


@pytest.mark.slow
def test_fuse_seeds_mesh_parallel_matches_serial(tmp_path):
    """On a multi-device mesh the -fuseSeeds auxiliaries run as ONE
    ReplicaSolver batch; each auxiliary labeling must bit-equal the serial
    LocalExpansionSolver(seed + i) it replaces (test mesh = the forced
    8-CPU-device conftest mesh)."""
    import dataclasses
    import cv2
    import jax
    from localexpstereo_tpu.utils import acrt

    assert len(jax.devices()) > 1
    rng = np.random.default_rng(0)
    h, w, nd = 36, 64, 8
    target = tmp_path / "scene"
    target.mkdir()
    im = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(target / "im0.png"), im)
    cv2.imwrite(str(target / "im1.png"), im)
    with open(target / "calib.txt", "w") as f:
        f.write(f"width={w}\nheight={h}\nndisp={nd}\n")
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    truth = np.clip(0.05 * xs + 0.02 * ys + 2.0, 1, nd - 2)
    d = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.minimum((d - truth[None]) ** 2 * 0.2, 1.0).astype(np.float32)
    acrt.write_acrt(str(target / "im0.acrt"), vol)

    opt = cli.parse_args(["-mode", "MiddV3", "-targetDir", str(target),
                          "-iterations", "1", "-pmIterations", "1",
                          "-volPrecision", "float32", "-fuseSeeds", "3"])
    pair = cli.datasets.load_data(opt.target_dir, opt.ndisp)
    vol_l, vol_r = cli.load_v3_volumes(opt.target_dir, opt.volume, pair)
    layers = cli.v3_layers(w)

    batch_aux = cli._make_batch_aux(pair, opt, layers, vols=(vol_l, vol_r))
    rs = batch_aux(opt.seed + 1, 2)
    rs.run(opt.iterations, (0,), opt.pm_iterations)

    for b in range(2):
        aux = cli._make_solver(
            pair, dataclasses.replace(opt, seed=opt.seed + 1 + b),
            layers=layers, vols=(vol_l, vol_r))
        aux.run(opt.iterations, (0,), opt.pm_iterations)
        want = np.asarray(aux._unpadded_labeling(aux._state, 0))
        np.testing.assert_array_equal(rs.labeling(b, mode=0), want)
