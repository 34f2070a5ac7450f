"""Engine integration tests on tiny synthetic problems (CPU).

Mirrors the reference's implicit oracles (SURVEY.md section 4): energy must
be monotone non-increasing under graph-cut sweeps, and a known constant
disparity must be recovered.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models import engine as engine_mod
from localexpstereo_tpu.models.engine import LocalExpansionSolver
from localexpstereo_tpu.ops import plane as plane_ops


@pytest.fixture(scope="module")
def synthetic_pair():
    """Smooth random texture with constant true disparity 5."""
    rng = np.random.default_rng(0)
    h, w, d = 32, 44, 5
    base = rng.random((h, w + 12, 3)).astype(np.float32)
    k = np.ones((5, 5)) / 25.0
    for c in range(3):
        from scipy.signal import convolve2d
        base[..., c] = convolve2d(base[..., c], k, mode="same",
                                  boundary="symm")
    base *= 255
    return base[:, 0:w], base[:, d:d + w], d


def _solver(pair, **kw):
    im0, im1, _ = pair
    params = PARAMS_GF.replace(windR=6)
    s = LocalExpansionSolver(im0, im1, params, max_disp=10.0, seed=0, **kw)
    s.add_layer(4, ("expansion", "ransac", "random7"))
    s.add_layer(8, ("expansion", "expansion", "ransac"))
    return s


def test_greedy_recovers_constant_disparity(synthetic_pair):
    s = _solver(synthetic_pair)
    lab, _ = s.run(iterations=0, view_modes=(0,), pm_iterations=2)
    d_true = synthetic_pair[2]
    d = np.asarray(plane_ops.disparity_map(jnp.asarray(lab)))
    interior = d[2:-2, d_true + 2:-2]
    assert np.mean(np.abs(interior - d_true) < 1.0) > 0.9


def test_gc_energy_monotone(synthetic_pair):
    s = _solver(synthetic_pair)
    s.finalize()
    root = jax.random.PRNGKey(0)
    st = engine_mod.init_step(s.data, s.cfg, root,
                              unit_size=s.layers[0].unit_size, mode=0)
    energies = []
    for it in range(3):
        st = s._sweep(st, 0, it, True, jax.random.fold_in(root, it))
        tot, _, _ = engine_mod.energy_audit(s.data, s.cfg, st[0], st[1], 0)
        energies.append(float(tot))
    assert all(b <= a + 1e-2 for a, b in zip(energies, energies[1:])), energies


@pytest.mark.slow
def test_dual_view_run_with_postprocess(synthetic_pair):
    s = _solver(synthetic_pair)
    lab, raw = s.run(iterations=1, view_modes=(0, 1), pm_iterations=1)
    assert lab.shape == raw.shape
    d = np.asarray(plane_ops.disparity_map(jnp.asarray(lab)))
    assert np.isfinite(d).all()


def test_determinism_same_seed(synthetic_pair):
    s1 = _solver(synthetic_pair)
    lab1, _ = s1.run(iterations=0, view_modes=(0,), pm_iterations=1)
    s2 = _solver(synthetic_pair)
    lab2, _ = s2.run(iterations=0, view_modes=(0,), pm_iterations=1)
    np.testing.assert_array_equal(np.asarray(lab1), np.asarray(lab2))


def test_volume_energy_roundtrip(synthetic_pair):
    """The cost-volume path must drive disparities toward the volume's
    argmin (a synthetic V-shaped volume with minimum at d=4)."""
    im0, im1, _ = synthetic_pair
    h, w = im0.shape[:2]
    nd = 10
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.abs(dd - 4.0) * np.ones((nd, h, w), np.float32) * 0.1
    params = PARAMS_GF.replace(windR=6, th_col=0.5)
    s = LocalExpansionSolver(im0, im1, params, max_disp=float(nd - 1),
                             vol0=vol, vol1=vol, seed=0)
    s.add_layer(4, ("expansion", "ransac", "random7"))
    lab, _ = s.run(iterations=1, view_modes=(0,), pm_iterations=1)
    d = np.asarray(plane_ops.disparity_map(jnp.asarray(lab)))
    assert np.mean(np.abs(d - 4.0) < 1.0) > 0.8
