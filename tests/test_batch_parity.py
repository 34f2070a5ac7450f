"""BatchedSolver full-pipeline parity: pair b of a batched dual-view run
must reproduce the single-pair engine with seed + b bit-for-bit (VERDICT
round-1 item 4 / BASELINE config 3)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import LocalExpansionSolver
from localexpstereo_tpu.parallel import batch as batch_mod
from localexpstereo_tpu.parallel import mesh as mesh_mod


def _problems(b=2, h=26, w=34, nd=8, seed=11):
    rng = np.random.default_rng(seed)
    ims = (rng.random((b, h, w, 3)) * 255).astype(np.float32)
    ims1 = (rng.random((b, h, w, 3)) * 255).astype(np.float32)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    vols = []
    for i in range(b):
        d_true = np.clip(rng.random((h, w), np.float32) * (nd - 1), 0, nd - 1)
        vols.append(np.minimum(np.abs(dd - d_true[None]) * 0.4, 1.0))
    return ims, ims1, np.stack(vols).astype(np.float32), nd


@pytest.mark.slow
def test_batched_matches_single_pair_dual_view(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    mesh = mesh_mod.make_mesh((2,), ("data",), jax.devices()[:2])
    ims0, ims1, vols, nd = _problems()
    params = PARAMS_GF.replace(windR=4, lambda_=0.5, th_col=0.5)
    seed = 5

    bs = batch_mod.BatchedSolver(
        ims0, ims1, params, max_disp=float(nd - 1), mesh=mesh,
        unit_sizes=[3, 5], vols0=vols, vols1=vols, seed=seed,
        vol_dtype="float32")
    final_b, raw_b = bs.run(iterations=1, view_modes=(0, 1),
                            pm_iterations=1)

    for b in range(2):
        single = LocalExpansionSolver(
            ims0[b], ims1[b], params, max_disp=float(nd - 1),
            vol0=vols[b], vol1=vols[b], seed=seed + b, vol_dtype="float32")
        single.add_layer(3, ("expansion", "ransac", "random7"))
        single.add_layer(5, ("expansion", "expansion", "ransac"))
        final_s, raw_s = single.run(iterations=1, view_modes=(0, 1),
                                    pm_iterations=1)
        np.testing.assert_array_equal(raw_b[b], raw_s)
        np.testing.assert_array_equal(final_b[b], final_s)


@pytest.mark.slow
def test_batched_checkpoint_resume(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    mesh = mesh_mod.make_mesh((2,), ("data",), jax.devices()[:2])
    ims0, ims1, vols, nd = _problems()
    params = PARAMS_GF.replace(windR=4, lambda_=0.5, th_col=0.5)
    ck = os.path.join(tmp_path, "batch.npz")

    bs = batch_mod.BatchedSolver(
        ims0, ims1, params, max_disp=float(nd - 1), mesh=mesh,
        unit_sizes=[4], vols0=vols, vols1=vols, seed=1)
    final1, _ = bs.run(iterations=2, view_modes=(0,), pm_iterations=0,
                       checkpoint_path=ck, checkpoint_every=1)

    bs2 = batch_mod.BatchedSolver(
        ims0, ims1, params, max_disp=float(nd - 1), mesh=mesh,
        unit_sizes=[4], vols0=vols, vols1=vols, seed=1)
    final2, _ = bs2.run(iterations=2, view_modes=(0,), pm_iterations=0,
                        resume_from=ck)
    # The checkpoint stores state after GC sweep 1 of 2 (checkpoint_every=1
    # keeps overwriting; the last write is at total==2 -> equals final).
    np.testing.assert_array_equal(final2, final1)


@pytest.mark.slow
def test_batched_evaluator_logs(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from localexpstereo_tpu.models.evaluator import Evaluator
    mesh = mesh_mod.make_mesh((2,), ("data",), jax.devices()[:2])
    ims0, ims1, vols, nd = _problems()
    params = PARAMS_GF.replace(windR=4, lambda_=0.5, th_col=0.5)

    bs = batch_mod.BatchedSolver(
        ims0, ims1, params, max_disp=float(nd - 1), mesh=mesh,
        unit_sizes=[4], vols0=vols, vols1=vols, seed=1)
    evs = []
    gts = np.clip(np.random.default_rng(0).random((2, 26, 34)) * nd, 0.01,
                  None).astype(np.float32)
    for b in range(2):
        d = os.path.join(tmp_path, f"pair{b}")
        evs.append(Evaluator(gts[b], None, 255.0 / nd, save_dir=d,
                             save=True, print_progress=False))
        evs[-1].set_precision(-1.0)
    bs.set_evaluators(evs)
    bs.run(iterations=1, view_modes=(0,), pm_iterations=1)
    for b in range(2):
        evs[b].close()
        log = os.path.join(tmp_path, f"pair{b}", "log_output.txt")
        rows = open(log).read().strip().splitlines()
        # header + init + pm sweep + gc sweep
        assert len(rows) == 4
        eng = [float(r.split("\t")[1]) for r in rows[1:]]
        assert eng[2] <= eng[1] + 1e-3  # GC sweep monotone
