"""Accuracy-parity regression guards (VERDICT round-1 item 2).

``tools/parity_run.py`` pins full-schedule numbers on the real device into
``PARITY_r2.json``; these tests (a) sanity-check the committed pins and (b)
re-run a reduced cones schedule end-to-end so any perf change that silently
degrades bad rates fails CI (the analog of the reference's seed-0 fixture,
``main.cpp:431-441``).
"""
import json
import os
import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_parity_pins_committed():
    p = REPO / "PARITY_r2.json"
    if not p.exists():
        pytest.skip("PARITY_r2.json not generated yet")
    rec = json.loads(p.read_text())
    ds = rec["datasets"]
    assert set(ds) >= {"cones", "teddy", "tsukuba", "venus"}
    # Quality gates: the reference's published V2 behavior is low-single-digit
    # bad0.5 nonocc on cones/venus and somewhat higher on teddy/tsukuba.
    # These bounds are deliberately loose — they catch collapses, while the
    # exact pinned values are tracked by re-running tools/parity_run.py.
    assert ds["cones"]["bad0.5_nonocc"] < 6.0
    assert ds["teddy"]["bad0.5_nonocc"] < 12.0
    assert ds["venus"]["bad0.5_nonocc"] < 6.0
    assert ds["tsukuba"]["bad0.5_nonocc"] < 16.0
    for name, d in ds.items():
        assert d["bad2.0_nonocc"] < d["bad0.5_nonocc"] + 1e-9
        assert np.isfinite(d["energy"]) and d["energy"] > 0


@pytest.mark.slow
def test_cones_reduced_schedule_quality(cones_dir, tmp_path):
    """End-to-end cones at 1 pm + 2 GC sweeps: bad0.5 nonocc must stay in the
    healthy band (5.3% measured at 1+1; the full 5+2 schedule reaches ~4%)."""
    from localexpstereo_tpu.cli import main as cli
    from localexpstereo_tpu.utils import datasets, pfm

    out = str(tmp_path / "cones")
    rc = cli.main(["-mode", "MiddV2", "-targetDir", cones_dir,
                   "-outputDir", out, "-iterations", "2",
                   "-pmIterations", "1", "-seed", "0"])
    assert rc == 0

    pair = datasets.load_data(cones_dir, 0)
    disp = pfm.read_pfm(os.path.join(out, "disp0.pfm"))
    prec = pair.calib.gt_prec
    if prec > 0:
        disp = np.rint(disp / prec) * prec
    nonocc = pair.nonocc
    ok = np.abs(disp - pair.disp_gt) <= 0.5
    bad = 100.0 * (1.0 - (ok & nonocc).sum() / nonocc.sum())
    assert bad < 6.5, f"cones bad0.5 nonocc regressed: {bad:.2f}%"

    # Energy monotone across GC sweeps (the reference's implicit oracle).
    rows = open(os.path.join(out, "debug", "log_output.txt")
                ).read().strip().splitlines()[1:]
    eng = [float(r.split("\t")[1]) for r in rows]
    assert eng[2] <= eng[1] and eng[3] <= eng[2]
