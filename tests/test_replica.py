"""ReplicaSolver: one-pair-per-chip shard_map data parallelism.

Deployment contract (BASELINE config 3): pair ``b`` of a sharded batch is
BIT-IDENTICAL to ``LocalExpansionSolver(seed=seed + b)`` — the per-device
program is the unchanged single-pair engine, so batching over the mesh is
purely a placement choice (cf. reference ``demo.bat`` serial runs and the
per-thread seeding at ``main.cpp:444-450``).
"""
import jax
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import LocalExpansionSolver
from localexpstereo_tpu.parallel import mesh as mesh_mod
from localexpstereo_tpu.parallel.replica import ReplicaSolver


def _problems(b, h=28, w=36, nd=6, seed=0):
    rng = np.random.default_rng(seed)
    ims = (rng.random((b, h, w, 3)) * 255).astype(np.float32)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    vols = []
    for i in range(b):
        d_true = rng.random((h, w), np.float32) * (nd - 1)
        vols.append(np.minimum(np.abs(dd - d_true[None]) * 0.4, 1.0))
    return ims, np.stack(vols).astype(np.float32)


PARAMS = PARAMS_GF.replace(windR=4, lambda_=0.5, th_col=0.5)


def _single(ims, vols, b, seed, iters=1, pm=1, views=(0,)):
    s = LocalExpansionSolver(ims[b], ims[b], PARAMS,
                             max_disp=float(vols.shape[1] - 1),
                             vol0=vols[b], vol1=vols[b], seed=seed + b,
                             vol_dtype="float32")
    s.add_layer(3, ("expansion", "ransac", "random7"))
    return s.run(iterations=iters, view_modes=views, pm_iterations=pm)


@pytest.mark.slow
@pytest.mark.parametrize("ndev", [4])
def test_replica_bit_parity(ndev):
    """Pair b under shard_map == LocalExpansionSolver(seed + b), bitwise."""
    ims, vols = _problems(ndev)
    mesh = mesh_mod.make_mesh((ndev,), ("data",), jax.devices()[:ndev])
    rs = ReplicaSolver(ims, ims, PARAMS, max_disp=float(vols.shape[1] - 1),
                       mesh=mesh, unit_sizes=[3], vols0=vols, vols1=vols,
                       seed=7, vol_dtype="float32")
    final, _ = rs.run(iterations=1, view_modes=(0,), pm_iterations=1)
    for b in range(ndev):
        ref, _ = _single(ims, vols, b, seed=7)
        assert np.array_equal(final[b], ref), f"pair {b} diverged"


@pytest.mark.slow
def test_replica_waves():
    """batch > n_devices runs in waves (k local pairs per device) and still
    matches the single-pair engine per pair; padded pairs are dropped."""
    ndev, batch = 2, 3
    ims, vols = _problems(batch)
    mesh = mesh_mod.make_mesh((ndev,), ("data",), jax.devices()[:ndev])
    rs = ReplicaSolver(ims, ims, PARAMS, max_disp=float(vols.shape[1] - 1),
                       mesh=mesh, unit_sizes=[3], vols0=vols, vols1=vols,
                       seed=0, vol_dtype="float32")
    assert rs.k == 2 and rs.padded == 4
    final, _ = rs.run(iterations=1, view_modes=(0,), pm_iterations=0)
    assert final.shape[0] == batch
    for b in range(batch):
        ref, _ = _single(ims, vols, b, seed=0, pm=0)
        assert np.array_equal(final[b], ref), f"pair {b} diverged"


@pytest.mark.slow
def test_replica_dual_view_postprocess():
    """doDual path: per-pair post-processing matches the single-pair run."""
    ndev = 2
    ims, vols = _problems(ndev, h=24, w=30)
    mesh = mesh_mod.make_mesh((ndev,), ("data",), jax.devices()[:ndev])
    rs = ReplicaSolver(ims, ims, PARAMS, max_disp=float(vols.shape[1] - 1),
                       mesh=mesh, unit_sizes=[3], vols0=vols, vols1=vols,
                       seed=1, vol_dtype="float32")
    final, raw = rs.run(iterations=1, view_modes=(0, 1), pm_iterations=1)
    for b in range(ndev):
        ref_final, ref_raw = _single(ims, vols, b, seed=1, views=(0, 1))
        assert np.array_equal(raw[b], ref_raw)
        assert np.array_equal(final[b], ref_final)
