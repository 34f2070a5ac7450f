"""Accuracy-parity regression guards (VERDICT round-1 item 2, round-2 item 4).

``tools/parity_run.py`` pins full-schedule numbers on the real device into
``PARITY_r*.json`` (assert tightly on demand via ``--check``); these tests
(a) sanity-check the committed pins, and (b) re-run a reduced cones schedule
end-to-end and assert it against a COMMITTED pin within ±0.3 % absolute —
the tight CI gate (the analog of the reference's seed-0 fixture,
``main.cpp:431-441``). Same backend + same seed is deterministic, so the
tolerance only absorbs XLA version drift; regenerate intentionally after an
RNG/schedule change with::

    CONES_PIN_UPDATE=1 python -m pytest tests/test_parity.py -q -m slow
"""
import json
import os
import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
CONES_PIN = pathlib.Path(__file__).parent / "data" / "cones_reduced_pin.json"


def _latest_pins():
    cands = sorted(REPO.glob("PARITY_r*.json"))
    return cands[-1] if cands else None


def test_parity_pins_committed():
    p = _latest_pins()
    if p is None:
        pytest.skip("no PARITY_r*.json generated yet")
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
    """End-to-end cones at 1 pm + 2 GC sweeps, asserted against the
    committed per-backend pin within ±0.3 % absolute on bad0.5 nonocc and
    0.5 % relative on the final energy (tight gate; any perf change that
    shifts accuracy fails here)."""
    import jax

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

    rows = open(os.path.join(out, "debug", "log_output.txt")
                ).read().strip().splitlines()[1:]
    eng = [float(r.split("\t")[1]) for r in rows]
    # Energy monotone across GC sweeps (the reference's implicit oracle).
    assert eng[2] <= eng[1] and eng[3] <= eng[2]

    backend = jax.default_backend()
    if os.environ.get("CONES_PIN_UPDATE"):
        pins = (json.loads(CONES_PIN.read_text())
                if CONES_PIN.exists() else {})
        pins[backend] = {"bad05_nonocc": round(bad, 4),
                         "final_energy": eng[-1]}
        CONES_PIN.parent.mkdir(exist_ok=True)
        CONES_PIN.write_text(json.dumps(pins, indent=1) + "\n")
        pytest.skip(f"pin updated: {pins[backend]}")
    if not CONES_PIN.exists():
        pytest.skip("cones_reduced_pin.json not generated yet")
    pins = json.loads(CONES_PIN.read_text())
    if backend not in pins:
        pytest.skip(f"no cones pin for backend {backend}")
    pin = pins[backend]
    assert abs(bad - pin["bad05_nonocc"]) <= 0.3, \
        f"cones bad0.5 nonocc {bad:.3f} vs pin {pin['bad05_nonocc']}"
    assert abs(eng[-1] - pin["final_energy"]) <= 0.005 * pin["final_energy"], \
        f"cones final energy {eng[-1]} vs pin {pin['final_energy']}"
