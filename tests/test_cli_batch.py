"""Batch driver (cli/batch.py): shape grouping, per-dataset artifacts,
per-pair RNG parity with the single-pair CLI seed convention."""
import json

import numpy as np
import pytest

from localexpstereo_tpu.cli import batch as cli_batch
from localexpstereo_tpu.utils import acrt, pfm


def _make_scene(root, name, h, w, nd, seed):
    import cv2
    rng = np.random.default_rng(seed)
    target = root / name
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
    return target, truth


def test_parse_args_reference_style():
    ns = cli_batch.parse_args(["-mode", "MiddV3", "-targetDirs", "/a", "/b",
                               "-doDual", "1", "-volPrecision", "float32"])
    assert ns.targetDirs == ["/a", "/b"] and ns.doDual == 1
    assert ns.volPrecision == "float32"


@pytest.mark.slow
def test_batch_driver_groups_and_outputs(tmp_path):
    """Two same-shape scenes batch into ONE group (one executable set, one
    ReplicaSolver run); a third, different-shape scene lands in its own
    group. Every dataset gets the full single-pair artifact set and
    recovers its planted plane."""
    h, w, nd = 40, 72, 10
    truths = {}
    d1, truths["s1"] = _make_scene(tmp_path, "s1", h, w, nd, seed=1)
    d2, truths["s2"] = _make_scene(tmp_path, "s2", h, w, nd, seed=2)
    d3, truths["s3"] = _make_scene(tmp_path, "s3", h, w + 16, nd, seed=3)

    out = tmp_path / "out"
    ns = cli_batch.parse_args(
        ["-mode", "MiddV3", "-targetDirs", str(d1), str(d2), str(d3),
         "-outputDir", str(out), "-iterations", "1", "-pmIterations", "1",
         "-warmup", "0", "-volPrecision", "float32"])
    summary = cli_batch.run_batch(ns)

    shapes = sorted(tuple(g["shape"]) for g in summary["groups"])
    assert shapes == [(h, w, nd), (h, w + 16, nd)]
    by_shape = {tuple(g["shape"]): g for g in summary["groups"]}
    assert sorted(by_shape[(h, w, nd)]["datasets"]) == ["s1", "s2"]
    assert by_shape[(h, w + 16, nd)]["datasets"] == ["s3"]

    assert json.load(open(out / "batch_summary.json"))["groups"]
    for name, truth in truths.items():
        disp = pfm.read_pfm(str(out / name / "disp0.pfm"))
        assert disp.shape == truth.shape
        err = np.abs(disp - truth)[6:-6, nd:-6]
        assert np.median(err) < 0.75, name
        rows = open(out / name / "debug" / "log_output.txt"
                    ).read().strip().splitlines()
        assert rows[0].startswith("Time\t") and len(rows) >= 3
        assert float(open(out / name / "time.txt").read()) >= 0.0


def test_dedupe_names():
    entries = [{"dir": "/d/trainingH/Adirondack", "name": "Adirondack"},
               {"dir": "/d/trainingQ/Adirondack", "name": "Adirondack"},
               {"dir": "/d/trainingH/ArtL", "name": "ArtL"}]
    cli_batch._dedupe_names(entries)
    names = [e["name"] for e in entries]
    assert len(set(names)) == 3
    assert "trainingH_Adirondack" in names
    assert "trainingQ_Adirondack" in names
    assert "ArtL" in names


@pytest.mark.slow
def test_batch_driver_midv2_mode(tmp_path):
    """MiddV2 batch (image-based data term, no volumes) through the
    ReplicaSolver path: same-shape scenes group and produce artifacts.
    GT-less datasets must run (bad-rate columns become nan)."""
    import cv2
    rng = np.random.default_rng(0)
    h, w, nd = 40, 64, 8
    dirs = []
    for name in ("a", "b"):
        d = tmp_path / name
        d.mkdir()
        im = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / "im0.png"), im)
        cv2.imwrite(str(d / "im1.png"), im)
        with open(d / "info.txt", "w") as f:
            f.write(f"4\n{nd}\n")
        dirs.append(str(d))

    out = tmp_path / "out"
    ns = cli_batch.parse_args(
        ["-mode", "MiddV2", "-targetDirs"] + dirs +
        ["-outputDir", str(out), "-iterations", "1", "-pmIterations", "1",
         "-warmup", "0"])
    summary = cli_batch.run_batch(ns)
    assert summary["groups"][0]["batch"] == 2
    for name in ("a", "b"):
        disp = pfm.read_pfm(str(out / name / "disp0.pfm"))
        assert disp.shape == (h, w)
        assert np.isfinite(disp).all()
