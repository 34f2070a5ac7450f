"""Engine-level cost-volume sharding (parallel/volume.py): the FULL solver
on an H-sharded volume must match the single-device engine bit-for-bit
(VERDICT round-1 item 3 / BASELINE config 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import LocalExpansionSolver
from localexpstereo_tpu.parallel import mesh as mesh_mod
from localexpstereo_tpu.parallel.volume import ShardedVolumeSolver


def _problem(h=37, w=48, nd=12, seed=3):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d_true = np.clip(0.05 * xs - 0.02 * ys + 4.0, 0, nd - 1)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.minimum(np.abs(dd - d_true[None]) * 0.3, 1.0).astype(np.float32)
    vol += rng.random(vol.shape, np.float32) * 0.05
    return img, vol, nd


def _make(cls, img, vol, nd, unit_sizes, **kw):
    params = PARAMS_GF.replace(windR=4, lambda_=0.5, th_col=0.5)
    s = cls(img, img, params, max_disp=float(nd - 1), vol0=vol, vol1=vol,
            seed=7, **kw)
    for i, us in enumerate(unit_sizes):
        s.add_layer(us, ("expansion", "ransac", "random7") if i == 0
                    else ("expansion", "expansion", "ransac"))
    return s


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [3, 8])
def test_sharded_full_run_bitexact(n_dev):
    devices = jax.devices()[:n_dev]
    mesh = mesh_mod.make_mesh((n_dev,), ("space",), devices)
    img, vol, nd = _problem()
    unit_sizes = [3, 5]

    ref = _make(LocalExpansionSolver, img, vol, nd, unit_sizes)
    lab_ref, raw_ref = ref.run(iterations=2, view_modes=(0,),
                               pm_iterations=1)

    sh = _make(ShardedVolumeSolver, img, vol, nd, unit_sizes, mesh=mesh)
    lab_sh, raw_sh = sh.run(iterations=2, view_modes=(0,), pm_iterations=1)

    np.testing.assert_array_equal(lab_sh, lab_ref)
    np.testing.assert_array_equal(raw_sh, raw_ref)
    # The cost state must match too (it feeds subsequent sweeps).
    c_ref = np.asarray(ref._state[0][1])
    c_sh = np.asarray(sh._state[0][1])
    np.testing.assert_array_equal(c_sh, c_ref)


@pytest.mark.slow
def test_sharded_volume_exceeds_single_device_budget():
    """The config-4 scenario: per-device volume residency is ~1/n of the
    full volume (+halo), i.e. the sharded engine can hold a volume n times
    larger than one device's budget."""
    n_dev = 8
    devices = jax.devices()[:n_dev]
    mesh = mesh_mod.make_mesh((n_dev,), ("space",), devices)
    img, vol, nd = _problem(h=64, w=40, nd=10)
    sh = _make(ShardedVolumeSolver, img, vol, nd, [3], mesh=mesh)
    sh.finalize()
    hq = sh.hq
    local_rows = sh.data.vol.shape[3]
    assert local_rows == hq + 2 * sh.halo
    # Run one greedy + one GC sweep end-to-end on the sharded volume.
    lab, _ = sh.run(iterations=1, view_modes=(0,), pm_iterations=1)
    assert lab.shape == (64, 40, 4)
    assert np.isfinite(lab).all()


@pytest.mark.slow
@pytest.mark.parametrize("interp", [0, 2])
def test_sharded_bitexact_nonlinear_interp(interp):
    """The former interp==1 restriction is lifted: nearest (0) and
    quadratic (2) d-interpolation run sharded via the method-aware slab
    sampler (unary_volume.sample_slabs_method) and must stay bit-equal to
    the single-device engine (which gathers from the full volume)."""
    n_dev = 4
    mesh = mesh_mod.make_mesh((n_dev,), ("space",),
                              jax.devices()[:n_dev])
    img, vol, nd = _problem()
    unit_sizes = [3, 5]

    ref = _make(LocalExpansionSolver, img, vol, nd, unit_sizes,
                interp=interp)
    lab_ref, _ = ref.run(iterations=1, view_modes=(0,), pm_iterations=1)

    sh = _make(ShardedVolumeSolver, img, vol, nd, unit_sizes, mesh=mesh,
               interp=interp)
    lab_sh, _ = sh.run(iterations=1, view_modes=(0,), pm_iterations=1)

    np.testing.assert_array_equal(lab_sh, lab_ref)
