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
