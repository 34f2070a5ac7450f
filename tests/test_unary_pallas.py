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
