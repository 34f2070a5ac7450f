"""Region-on-lanes (rl) V3 unary pipeline vs the region-major oracle.

The rl layout ([D, F, F, N] slabs, [C, F, F, N] GF stats) is a pure layout
change of the hot fine-layer pipeline — the per-window math and reduction
orders are identical to the region-major path, so results must match to
float rounding, and a forced-rl end-to-end solve must behave like the
region-major one (monotone energy, near-identical result quality).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models import energy as energy_mod
from localexpstereo_tpu.models.engine import LocalExpansionSolver
from localexpstereo_tpu.ops import guided, unary_volume, windows


def _setup(h=40, w=52, nd=7, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    d_true = rng.random((h, w), np.float32) * (nd - 1)
    vol = np.minimum(np.abs(dd - d_true[None]) * 0.4, 1.0).astype(np.float32)
    params = PARAMS_GF.replace(windR=4, lambda_=0.5, th_col=0.5)
    s = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                             vol0=vol, vol1=vol, seed=seed,
                             vol_dtype="float32")
    s.add_layer(4, ("expansion", "ransac", "random7"))
    s.finalize()
    return s


def test_sample_slabs_rl_matches_aligned():
    solver = _setup()
    data, cfg = solver.data, solver.cfg
    layer = solver.layers[0]
    s = layer.unit_size
    ss = 3 * s
    r = cfg.params.guided_radius
    fsize = ss + 2 * r
    ox, oy, _ = layer.color_regions(1, 2)
    cox, coy = layer.canvas_origin(1, 2)
    rng = np.random.default_rng(1)
    n = ox.shape[0]
    props = jnp.asarray(np.stack([
        rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n),
        rng.uniform(0, 6, n), np.zeros(n)], -1).astype(np.float32))
    fox = jnp.asarray(ox) - s - r
    foy = jnp.asarray(oy) - s - r

    slab_rm = energy_mod.dense_volume_slabs(
        data, cfg, 0, coy, cox, s, layer.nby, layer.nbx, -s, ss)
    slab_rl = energy_mod.dense_volume_slabs_rl(
        data, cfg, 0, coy, cox, s, layer.nby, layer.nbx, -s, ss)
    assert slab_rl.shape == (data.vol.shape[1], fsize, fsize, n)
    # Same windows, different layout.
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(slab_rl), -1, 0),
        np.transpose(np.asarray(slab_rm), (0, 1, 2, 3)))

    raw_rm = unary_volume.sample_slabs_aligned(
        slab_rm, props, fox, foy, cfg.height, cfg.width,
        min_disp=cfg.min_disp, th_col=cfg.params.th_col)
    raw_rl = unary_volume.sample_slabs_rl(
        slab_rl, props, fox, foy, cfg.height, cfg.width,
        min_disp=cfg.min_disp, th_col=cfg.params.th_col)
    np.testing.assert_allclose(np.moveaxis(np.asarray(raw_rl), -1, 0),
                               np.asarray(raw_rm), rtol=0, atol=1e-6)


def test_unary_windows_rl_matches_region_major():
    solver = _setup()
    data, cfg = solver.data, solver.cfg
    layer = solver.layers[0]
    s = layer.unit_size
    ss = 3 * s
    ox, oy, _ = layer.color_regions(0, 0)
    cox, coy = layer.canvas_origin(0, 0)
    rng = np.random.default_rng(2)
    n = ox.shape[0]
    props = jnp.asarray(np.stack([
        rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n),
        rng.uniform(0, 6, n), np.zeros(n)], -1).astype(np.float32))

    stat_rm = energy_mod.dense_filter_windows(
        data, cfg, 0, jnp.asarray(ox), jnp.asarray(oy), coy, cox, s,
        layer.nby, layer.nbx, -s, ss)
    slab_rm = energy_mod.dense_volume_slabs(
        data, cfg, 0, coy, cox, s, layer.nby, layer.nbx, -s, ss)
    q_rm = energy_mod.unary_windows(data, cfg, 0, props, jnp.asarray(ox),
                                    jnp.asarray(oy), -s, ss, stat_rm,
                                    slab_rm)

    stat_rl = energy_mod.dense_filter_windows_rl(
        data, cfg, 0, jnp.asarray(ox), jnp.asarray(oy), coy, cox, s,
        layer.nby, layer.nbx, -s, ss)
    slab_rl = energy_mod.dense_volume_slabs_rl(
        data, cfg, 0, coy, cox, s, layer.nby, layer.nbx, -s, ss)
    q_rl = energy_mod.unary_windows_rl(data, cfg, 0, props, jnp.asarray(ox),
                                       jnp.asarray(oy), -s, ss, stat_rl,
                                       slab_rl)
    np.testing.assert_allclose(np.asarray(q_rl), np.asarray(q_rm),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_engine_rl_end_to_end():
    """Forced-rl solve: monotone energy and result quality on par with the
    region-major solve (accept decisions may differ by float rounding)."""
    from localexpstereo_tpu.models import engine as engine_mod

    solver = _setup()
    solver.cfg = dataclasses.replace(solver.cfg, unary_layout="rl")
    lab_rl, _ = solver.run(iterations=2, view_modes=(0,), pm_iterations=1)
    e_rl = engine_mod.energy_audit(solver.data, solver.cfg,
                                   *solver._state[0], 0)[0]

    ref = _setup()
    ref.cfg = dataclasses.replace(ref.cfg, unary_layout="rm")
    lab_rm, _ = ref.run(iterations=2, view_modes=(0,), pm_iterations=1)
    e_rm = engine_mod.energy_audit(ref.data, ref.cfg, *ref._state[0], 0)[0]

    # Identical schedules and RNG; energies agree to optimization noise.
    assert float(e_rl) <= float(e_rm) * 1.02 + 1e-3
