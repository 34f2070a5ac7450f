"""Pinned regression fixture — the analog of the reference's seed-0 debug
fixture (``main.cpp:431-441``, expected log line in a comment): a fixed-seed
tiny problem whose final energy is recorded and asserted, so cross-round
refactors that silently change the optimization are caught immediately.

Regenerate the constants with the snippet in the test if an INTENTIONAL
semantic change shifts them (and note why in the commit).
"""
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import LocalExpansionSolver, \
    energy_audit

GOLDEN_TOTAL = 727.8472
GOLDEN_DATA = 726.7287
GOLDEN_SMOOTH = 1.1185


def test_golden_energy_fixture():
    rng = np.random.default_rng(42)
    h, w, d = 28, 36, 4
    base = rng.random((h, w + 10, 3)).astype(np.float32) * 255
    im0, im1 = base[:, 0:w], base[:, d:d + w]
    s = LocalExpansionSolver(im0, im1, PARAMS_GF.replace(windR=4),
                             max_disp=9.0, seed=123)
    s.add_layer(4, ("expansion", "ransac", "random7"))
    s.run(iterations=1, view_modes=(0,), pm_iterations=1)
    lm, cm = s._state[0]
    tot, dc, sc = energy_audit(s.data, s.cfg, lm, cm, 0)
    # Loose-ish tolerance: CPU backends may reassociate float reductions.
    assert float(tot) == pytest.approx(GOLDEN_TOTAL, rel=2e-3)
    assert float(dc) == pytest.approx(GOLDEN_DATA, rel=2e-3)
    assert float(sc) == pytest.approx(GOLDEN_SMOOTH, rel=2e-2)
