"""MidV3 end-to-end accuracy pin (VERDICT round-2 missing item 3).

The reference ships a reproducibility fixture with expected Adirondack
numbers (``main.cpp:431-441``: energy 262247, bad1.0 nonocc 8.54%). The real
MC-CNN volumes are not redistributable, so the analog here is a DETERMINISTIC
synthetic MidV3 dataset (planted slanted-plane truth + quadratic-basin .acrt
volume, built from a fixed seed at test time — no binary fixture needed) with
a COMMITTED pin of the full driver's per-sweep energy trajectory and final
bad rates, asserted tightly on the backend the pin was generated on (CPU =
CI; same backend + same seed is deterministic, the tolerance only absorbs
XLA version drift).

Regenerate intentionally after an RNG/schedule change:
    MIDV3_PIN_UPDATE=1 python -m pytest tests/test_midv3_pin.py -m slow
"""
import json
import os
import pathlib

import numpy as np
import pytest

PIN_PATH = pathlib.Path(__file__).parent / "data" / "midv3_pin.json"
H, W, ND = 64, 128, 16
SEED = 0


def build_fixture(target: pathlib.Path):
    """Deterministic synthetic MidV3 scene (same recipe as
    test_cli.test_midv3_end_to_end_acrt, fixed shapes/seed)."""
    import cv2

    from localexpstereo_tpu.utils import acrt

    rng = np.random.default_rng(7)
    target.mkdir(parents=True, exist_ok=True)
    im = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(target / "im0.png"), im)
    cv2.imwrite(str(target / "im1.png"), im)
    with open(target / "calib.txt", "w") as f:
        f.write(f"width={W}\nheight={H}\nndisp={ND}\n")

    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    truth = np.clip(0.04 * xs + 0.03 * ys + 3.0, 1, ND - 2)
    d = np.arange(ND, dtype=np.float32)[:, None, None]
    vol = np.minimum((d - truth[None]) ** 2 * 0.2, 1.0).astype(np.float32)
    vol += (rng.random(vol.shape) * 0.02).astype(np.float32)
    acrt.write_acrt(str(target / "im0.acrt"), vol)
    return truth


def run_driver(tmp_path):
    from localexpstereo_tpu.cli import main as cli
    from localexpstereo_tpu.utils import pfm

    target = tmp_path / "scene"
    truth = build_fixture(target)
    out = tmp_path / "out"
    rc = cli.main(["-mode", "MiddV3", "-targetDir", str(target),
                   "-outputDir", str(out), "-iterations", "2",
                   "-pmIterations", "1", "-seed", str(SEED)])
    assert rc == 0

    disp = pfm.read_pfm(str(out / "disp0.pfm"))
    err = np.abs(disp - truth)[8:-8, ND:-8]
    rows = open(out / "debug" / "log_output.txt").read().strip().splitlines()
    energies = [float(r.split("\t")[1]) for r in rows[1:]]
    return {
        "energies": energies,
        "bad05": round(float((err > 0.5).mean() * 100.0), 3),
        "bad10": round(float((err > 1.0).mean() * 100.0), 3),
        "median_err": round(float(np.median(err)), 4),
    }


@pytest.mark.slow
def test_midv3_pinned_trajectory(tmp_path):
    import jax

    rec = run_driver(tmp_path)
    # Backend-independent sanity: monotone GC energies, planted plane found.
    e = rec["energies"]
    assert e[2] <= e[1] and e[3] <= e[2]
    assert rec["median_err"] < 0.5
    assert rec["bad10"] < 20.0

    backend = jax.default_backend()
    if os.environ.get("MIDV3_PIN_UPDATE") == "1":
        pins = json.loads(PIN_PATH.read_text()) if PIN_PATH.exists() else {}
        pins[backend] = rec
        PIN_PATH.parent.mkdir(exist_ok=True)
        PIN_PATH.write_text(json.dumps(pins, indent=1) + "\n")
        pytest.skip(f"pin updated for backend {backend}")

    if not PIN_PATH.exists():
        pytest.skip("midv3_pin.json not generated yet (MIDV3_PIN_UPDATE=1)")
    pins = json.loads(PIN_PATH.read_text())
    if backend not in pins:
        pytest.skip(f"no committed pin for backend {backend}")
    pin = pins[backend]
    # Same backend + same seed is deterministic; tolerances absorb only
    # XLA/jaxlib version drift (cf. the reference's expected-log check,
    # main.cpp:431-441).
    for got, want in zip(rec["energies"], pin["energies"]):
        assert abs(got - want) <= 0.002 * abs(want) + 1e-3, \
            (rec["energies"], pin["energies"])
    assert abs(rec["bad10"] - pin["bad10"]) <= 0.3, (rec, pin)
    assert abs(rec["bad05"] - pin["bad05"]) <= 0.5, (rec, pin)
