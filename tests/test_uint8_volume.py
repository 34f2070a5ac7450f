"""uint8-quantized cost-volume storage (``vol_dtype="uint8"``).

The volume is stored as 256 levels over [vol_zero, 2*th_col] and decoded
AFTER the tent contraction (linear, tent weights sum to 1 — exact
commutation; ``ops/unary_volume._decode``). Costs are truncated at
``th_col`` post-interpolation (``CostVolumeEnergy.h:98``), so the deviation
from f32 storage is bounded by scale/2 = th_col/255 per sample. End-to-end
quality is gated by the parity pins (PARITY.md); these tests pin the
numeric contract.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models import energy as energy_mod
from localexpstereo_tpu.models.engine import LocalExpansionSolver


def _mk(h=36, w=48, nd=8, seed=3, vol_dtype="float32", neg=False):
    rng = np.random.default_rng(seed)
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    d_true = rng.random((h, w), np.float32) * (nd - 1)
    vol = np.minimum(np.abs(dd - d_true[None]) * 0.4, 1.0).astype(np.float32)
    if neg:
        vol = vol - 0.1
    params = PARAMS_GF.replace(windR=4, lambda_=0.5, th_col=0.5)
    s = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                             vol0=vol, vol1=vol, seed=seed,
                             vol_dtype=vol_dtype)
    s.add_layer(4, ("expansion", "ransac", "random7"))
    s.finalize()
    return s, vol


def test_quantize_roundtrip_precision():
    s8, vol = _mk(vol_dtype="uint8")
    cfg = s8.cfg
    assert s8.data.vol.dtype == jnp.uint8
    assert cfg.vol_zero == 0.0
    assert cfg.vol_scale == pytest.approx(2 * 0.5 / 255.0)
    vp = cfg.vol_pad
    dec = (np.asarray(s8.data.vol[0], np.float32) * cfg.vol_scale
           + cfg.vol_zero)[:, vp:vp + cfg.height, vp:vp + cfg.width]
    # Values <= 2*tau round-trip within half a step.
    np.testing.assert_allclose(dec, np.clip(vol, 0, 1.0),
                               atol=cfg.vol_scale / 2 + 1e-7)


def test_negative_costs_use_zero_point():
    s8, vol = _mk(vol_dtype="uint8", neg=True)
    cfg = s8.cfg
    assert cfg.vol_zero == pytest.approx(float(vol.min()))
    vp = cfg.vol_pad
    dec = (np.asarray(s8.data.vol[0], np.float32) * cfg.vol_scale
           + cfg.vol_zero)[:, vp:vp + cfg.height, vp:vp + cfg.width]
    np.testing.assert_allclose(dec, np.clip(vol, vol.min(), 1.0),
                               atol=cfg.vol_scale / 2 + 1e-7)


def test_device_build_quantizes_with_scale():
    """stats_backend="device" (the serving rebuild path) must quantize AND
    carry the decode scale on the config — regression for the round-3 bug
    where the device build stored uint8 with vol_scale left at 1.0 (all
    costs saturated at tau and the solve went blind)."""
    from localexpstereo_tpu.models import energy as energy_mod

    rng = np.random.default_rng(0)
    h, w, nd = 24, 32, 6
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    vol = rng.random((nd, h, w), np.float32)
    params = PARAMS_GF.replace(windR=4, th_col=0.5)
    data, cfg = energy_mod.build_energy(
        img, img, params, max_disp=float(nd - 1), pad=8, vol0=vol, vol1=vol,
        vol_dtype="uint8", stats_backend="device")
    assert data.vol.dtype == jnp.uint8
    assert cfg.vol_scale == pytest.approx(2 * 0.5 / 255.0)
    vp = cfg.vol_pad
    dec = (np.asarray(data.vol[0], np.float32) * cfg.vol_scale
           )[:, vp:vp + h, vp:vp + w]
    np.testing.assert_allclose(dec, np.clip(vol, 0, 1.0),
                               atol=cfg.vol_scale / 2 + 1e-7)


def test_unary_windows_close_to_f32():
    """Filtered unary costs from uint8 storage match f32 storage within the
    quantization bound (the GF is an average: the per-sample bound carries
    through), and invalid/out-of-image handling is identical."""
    s32, _ = _mk(vol_dtype="float32")
    s8, _ = _mk(vol_dtype="uint8")
    layer = s32.layers[0]
    s = layer.unit_size
    ss = 3 * s
    ox, oy, _ = layer.color_regions(1, 1)
    cox, coy = layer.canvas_origin(1, 1)
    rng = np.random.default_rng(4)
    n = ox.shape[0]
    props = jnp.asarray(np.stack([
        rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n),
        rng.uniform(-1, 8, n), np.zeros(n)], -1).astype(np.float32))

    out = {}
    for solver in ((s32, "f32"), (s8, "u8")):
        sv, tag = solver
        data, cfg = sv.data, sv.cfg
        stat = energy_mod.dense_filter_windows(
            data, cfg, 0, jnp.asarray(ox), jnp.asarray(oy), coy, cox, s,
            layer.nby, layer.nbx, -s, ss)
        slab = energy_mod.dense_volume_slabs(
            data, cfg, 0, coy, cox, s, layer.nby, layer.nbx, -s, ss)
        out[tag] = np.asarray(energy_mod.unary_windows(
            data, cfg, 0, props, jnp.asarray(ox), jnp.asarray(oy), -s, ss,
            stat, slab))

    inval = out["f32"] >= 1e5          # COST_FOR_INVALID propagated
    np.testing.assert_array_equal(inval, out["u8"] >= 1e5)
    tol = s8.cfg.vol_scale / 2 + 1e-5
    np.testing.assert_allclose(out["u8"][~inval], out["f32"][~inval],
                               atol=tol)


def test_gather_oracle_matches_slab_uint8():
    """sample_windows (gather path, decode-in-tap) == sample_windows_slab
    (decode-after-contraction) on uint8 storage."""
    from localexpstereo_tpu.ops import unary_volume

    s8, _ = _mk(vol_dtype="uint8")
    data, cfg = s8.data, s8.cfg
    vp = cfg.vol_pad
    vol_un = data.vol[0][:, vp:vp + cfg.height, vp:vp + cfg.width]
    rng = np.random.default_rng(5)
    n, size = 24, 12
    ox = jnp.asarray(rng.integers(-4, cfg.width - 4, n), jnp.int32)
    oy = jnp.asarray(rng.integers(-4, cfg.height - 4, n), jnp.int32)
    props = jnp.asarray(np.stack([
        rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n),
        rng.uniform(-1, 8, n), np.zeros(n)], -1).astype(np.float32))

    a = unary_volume.sample_windows_slab(
        vol_un, props, ox, oy, size, cfg.min_disp, cfg.max_disp,
        cfg.params.th_col, scale=cfg.vol_scale, zero=cfg.vol_zero)
    b = unary_volume.sample_windows(
        vol_un, props, ox, oy, size, cfg.min_disp, cfg.max_disp,
        cfg.params.th_col, 1, scale=cfg.vol_scale, zero=cfg.vol_zero)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_end_to_end_solve_quality_parity():
    """A full short solve from uint8 storage reaches energy within 3% of the
    f32-storage solve (identical schedule/RNG; accept decisions may differ
    by the quantization epsilon)."""
    from localexpstereo_tpu.models import engine as engine_mod

    s32, _ = _mk(vol_dtype="float32")
    s32.run(iterations=2, view_modes=(0,), pm_iterations=1)
    e32 = float(engine_mod.energy_audit(s32.data, s32.cfg,
                                        *s32._state[0], 0)[0])

    s8, _ = _mk(vol_dtype="uint8")
    s8.run(iterations=2, view_modes=(0,), pm_iterations=1)
    # The uint8 audit's data term carries the per-pixel quantization epsilon
    # (<= scale/2 each); 3% relative absorbs it plus flipped accepts.
    e8 = float(engine_mod.energy_audit(s8.data, s8.cfg,
                                       *s8._state[0], 0)[0])
    assert e8 <= e32 * 1.03 + 1e-3, (e8, e32)
