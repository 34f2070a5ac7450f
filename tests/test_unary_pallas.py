"""Fused DMA volume sampler (ops/unary_pallas.py) vs the XLA slab oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.ops import unary_pallas, unary_volume


@pytest.mark.parametrize("n,f,d", [(5, 7, 6), (17, 9, 12)])
def test_dma_sampler_matches_aligned_slabs(n, f, d):
    rng = np.random.default_rng(0)
    h, w, vp = 25, 31, 10
    vol = rng.random((d, h + 2 * vp, w + 2 * vp), np.float32)
    # DMA alignment padding (build_energy appends the same).
    vol = np.pad(vol, ((0, 0), (0, (-vol.shape[1]) % 8 + 8),
                       (0, (-vol.shape[2]) % 128 + 128)))
    props = np.stack([rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n),
                      rng.uniform(0, d - 1, n), np.zeros(n)],
                     -1).astype(np.float32)
    fox = rng.integers(-4, w - 2, n).astype(np.int32)
    foy = rng.integers(-4, h - 2, n).astype(np.int32)

    got = unary_pallas.sample_windows_dma(
        jnp.asarray(vol), jnp.asarray(props), jnp.asarray(fox),
        jnp.asarray(foy), vp, vp, f=f, height=h, width=w, min_disp=0.0,
        th_col=0.8, rb=4, interpret=True)

    # Oracle: aligned slabs sliced from the same padded volume.
    def one_slab(x0, y0):
        return vol[:, y0 + vp:y0 + vp + f, x0 + vp:x0 + vp + f]

    slabs = jnp.asarray(np.stack([one_slab(x, y) for x, y in zip(fox, foy)]))
    want = unary_volume.sample_slabs_aligned(
        slabs, jnp.asarray(props), jnp.asarray(fox), jnp.asarray(foy),
        h, w, min_disp=0.0, th_col=0.8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_dma_sampler_bf16_volume():
    rng = np.random.default_rng(1)
    d, h, w, vp, n, f = 5, 14, 18, 8, 6, 5
    vol = rng.random((d, h + 2 * vp, w + 2 * vp), np.float32)
    vol = np.pad(vol, ((0, 0), (0, (-vol.shape[1]) % 8 + 8),
                       (0, (-vol.shape[2]) % 128 + 128)))
    vol16 = jnp.asarray(vol, jnp.bfloat16)
    props = np.stack([np.zeros(n), np.zeros(n), rng.uniform(0, d - 1, n),
                      np.zeros(n)], -1).astype(np.float32)
    fox = np.zeros(n, np.int32)
    foy = np.arange(n, dtype=np.int32)
    got = unary_pallas.sample_windows_dma(
        vol16, jnp.asarray(props), jnp.asarray(fox), jnp.asarray(foy),
        vp, vp, f=f, height=h, width=w, min_disp=0.0, th_col=1.0, rb=2,
        interpret=True)
    slabs = jnp.asarray(np.stack(
        [np.asarray(vol16[:, y + vp:y + vp + f, vp:vp + f], np.float32)
         for y in foy]))
    want = unary_volume.sample_slabs_aligned(
        slabs, jnp.asarray(props), jnp.asarray(fox), jnp.asarray(foy),
        h, w, min_disp=0.0, th_col=1.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_dma_fused_gf_matches_filter_windows():
    """Fused in-kernel guided filter vs sample + guided.filter_windows."""
    from localexpstereo_tpu.ops import guided

    rng = np.random.default_rng(2)
    d, h, w, vp, n, f, r = 6, 26, 30, 12, 9, 11, 3
    vol = rng.random((d, h + 2 * vp, w + 2 * vp), np.float32)
    vol = np.pad(vol, ((0, 0), (0, (-vol.shape[1]) % 8 + 8),
                       (0, (-vol.shape[2]) % 128 + 128)))
    # Random (but well-conditioned) stats planes in the stacked layout.
    stack = rng.random((12, h, w)).astype(np.float32)
    stack[6:] = stack[6:] * 0.5 + 0.25          # inv-cov entries
    stack_p = np.zeros((12,) + vol.shape[1:], np.float32)
    stack_p[:, vp:vp + h, vp:vp + w] = stack

    props = np.stack([rng.uniform(-0.3, 0.3, n), rng.uniform(-0.3, 0.3, n),
                      rng.uniform(0, d - 1, n), np.zeros(n)],
                     -1).astype(np.float32)
    fox = rng.integers(-4, w - 3, n).astype(np.int32)
    foy = rng.integers(-4, h - 3, n).astype(np.int32)

    got = unary_pallas.sample_windows_dma(
        jnp.asarray(vol), jnp.asarray(props), jnp.asarray(fox),
        jnp.asarray(foy), vp, vp, f=f, height=h, width=w, min_disp=0.0,
        th_col=0.8, stats=jnp.asarray(stack_p), r_gf=r, rb=4,
        interpret=True)

    # Reference composition: raw windows then guided.filter_windows with
    # the SAME stats sliced per window (zeros outside the image, matching
    # the stacked array's padding).
    raw = unary_pallas.sample_windows_dma(
        jnp.asarray(vol), jnp.asarray(props), jnp.asarray(fox),
        jnp.asarray(foy), vp, vp, f=f, height=h, width=w, min_disp=0.0,
        th_col=0.8, rb=4, interpret=True)

    def win(ch, x0, y0):
        return stack_p[ch, y0 + vp:y0 + vp + f, x0 + vp:x0 + vp + f]

    gwin = np.stack([np.stack([win(c, x, y) for c in range(3)], -1)
                     for x, y in zip(fox, foy)])
    mwin = np.stack([np.stack([win(3 + c, x, y) for c in range(3)], -1)
                     for x, y in zip(fox, foy)])
    iwin = np.stack([np.stack([win(6 + c, x, y) for c in range(6)], -1)
                     for x, y in zip(fox, foy)])
    ys = foy[:, None, None] + np.arange(f)[None, :, None]
    xs = fox[:, None, None] + np.arange(f)[None, None, :]
    fmask = ((xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)).astype(np.float32)
    want = guided.filter_windows(raw, jnp.asarray(gwin), jnp.asarray(mwin),
                                 jnp.asarray(iwin), jnp.asarray(fmask), r)
    # filter_windows output is only defined where the box window has
    # in-image support (its docstring); at zero-support positions both
    # implementations divide by the 1e-8 clamp and tiny float differences
    # explode. The engine multiplies those away with tmask — compare the
    # supported region.
    from localexpstereo_tpu.ops import boxfilter
    support = np.asarray(boxfilter.boxsum2d(jnp.asarray(fmask), r)) > 0.5
    got_m = np.where(support, np.asarray(got), 0.0)
    want_m = np.where(support, np.asarray(want), 0.0)
    np.testing.assert_allclose(got_m, want_m, rtol=2e-4, atol=2e-4)


def test_dma_sampler_uint8_volume_exact_decode():
    """uint8-quantized volume through the DMA kernel == XLA slab oracle
    with the same scale/zero decode (the decode folds after the tent
    contraction exactly; uint8 uses the (32, 128) tiling, so build_energy
    pads H to a 32-multiple)."""
    rng = np.random.default_rng(2)
    d, h, w, vp, n, f = 7, 22, 30, 9, 9, 6
    tau = 0.5
    scale = 2.0 * tau / 255.0
    volf = rng.random((d, h + 2 * vp, w + 2 * vp), np.float32)
    volq = np.clip(np.rint(volf / scale), 0, 255).astype(np.uint8)
    volq = np.pad(volq, ((0, 0), (0, (-volq.shape[1]) % 32 + 32),
                         (0, (-volq.shape[2]) % 128 + 128)))
    props = np.stack([rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n),
                      rng.uniform(0, d - 1, n), np.zeros(n)],
                     -1).astype(np.float32)
    fox = rng.integers(-4, w - 3, n).astype(np.int32)
    foy = rng.integers(-4, h - 3, n).astype(np.int32)

    got = unary_pallas.sample_windows_dma(
        jnp.asarray(volq), jnp.asarray(props), jnp.asarray(fox),
        jnp.asarray(foy), vp, vp, f=f, height=h, width=w, min_disp=0.0,
        th_col=tau, rb=4, scale=scale, zero=0.0, interpret=True)

    def one_slab(x0, y0):
        return volq[:, y0 + vp:y0 + vp + f, x0 + vp:x0 + vp + f]

    slabs = jnp.asarray(np.stack([one_slab(x, y) for x, y in zip(fox, foy)]))
    want = unary_volume.sample_slabs_aligned(
        slabs, jnp.asarray(props), jnp.asarray(fox), jnp.asarray(foy),
        h, w, min_disp=0.0, th_col=tau, scale=scale, zero=0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["dma"])
def test_engine_integration_dma_backends_interpret(backend, monkeypatch):
    """Full solver with the DMA unary backends (interpret mode via the
    energy.DMA_INTERPRET hook) on a uint8 volume: the planted plane is
    recovered and the energy audit is monotone — guards the engine wiring
    (gates, fox/foy row structure, scale plumbing) that kernel-level
    oracles cannot see."""
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models import energy as energy_mod
    from localexpstereo_tpu.models.engine import (LocalExpansionSolver,
                                                  energy_audit)
    from localexpstereo_tpu.ops import plane as plane_ops

    monkeypatch.setattr(energy_mod, "DMA_INTERPRET", True)
    rng = np.random.default_rng(0)
    h, w, nd = 20, 36, 6
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    truth = np.clip(0.04 * xs + 0.02 * ys + 2.0, 0, nd - 1)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.minimum(np.abs(dd - truth[None]) * 0.4, 1.0).astype(np.float32)
    vol += rng.random(vol.shape, np.float32) * 0.03
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    params = PARAMS_GF.replace(windR=3, lambda_=0.5, th_col=0.5)

    solver = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                                  vol0=vol, vol1=vol, seed=0,
                                  vol_dtype="uint8",
                                  unary_backend=backend)
    solver.add_layer(3, ("expansion", "ransac"))
    lab, _ = solver.run(iterations=1, view_modes=(0,), pm_iterations=1)
    disp = np.asarray(plane_ops.disparity_map(jnp.asarray(lab)))
    err = np.abs(disp - truth)[4:-4, nd:-4]
    assert np.median(err) < 0.75
    e = float(energy_audit(solver.data, solver.cfg, *solver._state[0],
                           0)[0])
    assert np.isfinite(e)
