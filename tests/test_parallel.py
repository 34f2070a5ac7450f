"""Multi-device tests on the 8-device virtual CPU mesh."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.ops import boxfilter, guided
from localexpstereo_tpu.parallel import batch as batch_mod
from localexpstereo_tpu.parallel import mesh as mesh_mod
from localexpstereo_tpu.parallel import spatial


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_mod.make_mesh((8,), ("space",))


def test_sharded_boxsum_matches_local(mesh8):
    rng = np.random.default_rng(0)
    x = rng.random((64, 40)).astype(np.float32)
    r = 4
    want = np.asarray(boxfilter.boxsum2d(jnp.asarray(x), r))
    got = np.asarray(spatial.sharded_boxsum2d(jnp.asarray(x), r, mesh8))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sharded_cost_aggregation_matches_local(mesh8):
    # Slow lane: the halo-exchange core is covered in the default gate by
    # test_sharded_boxsum_matches_local; this composes the full guided
    # filter on the mesh (same machinery, 4x the compile).
    rng = np.random.default_rng(1)
    h, w, r = 64, 48, 3
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    p = rng.random((h, w)).astype(np.float32)
    stats = guided.compute_stats(img, r, 1e-4)
    want = np.asarray(guided.filter_image(jnp.asarray(p), stats, r))
    got = np.asarray(spatial.sharded_cost_aggregation(
        jnp.asarray(p), stats.guide, stats.mean, stats.inv, r, mesh8))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_batched_solver_data_parallel():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = mesh_mod.make_mesh((8,), ("data",))
    rng = np.random.default_rng(2)
    b, h, w = 8, 24, 32
    base = rng.random((b, h, w + 8, 3)).astype(np.float32) * 255
    ims0 = base[:, :, 0:w]
    ims1 = base[:, :, 3:3 + w]

    from localexpstereo_tpu.config import PARAMS_GF
    solver = batch_mod.BatchedSolver(
        ims0, ims1, PARAMS_GF.replace(windR=4), max_disp=7.0, mesh=mesh,
        unit_sizes=[4], seed=0)
    state = solver.init()
    (tot0, _, _), mean0 = solver.energies(state)
    state = solver.sweep(state, 0, do_gc=False)
    state = solver.sweep(state, 0, do_gc=True)
    (tot1, _, _), mean1 = solver.energies(state)
    assert tot1.shape == (b,)
    assert float(mean1) < float(mean0)
    d = np.asarray(solver.disparities(state))
    assert d.shape == (b, h, w)
    assert np.isfinite(d).all()
