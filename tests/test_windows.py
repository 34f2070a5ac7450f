"""Dense regular-grid window extraction vs the gather-based oracle."""
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.models import energy as energy_mod
from localexpstereo_tpu.ops import windows


@pytest.mark.parametrize("nby,nbx,s,f_extra", [
    (3, 4, 5, 0),      # F = 3s < T
    (2, 3, 5, 12),     # F = 3s + 2r > T (overlapping windows)
    (1, 1, 7, 4),      # single window
    (4, 2, 3, 2),      # F = 11 < T = 12
])
def test_dense_windows_match_dynamic_slices(nby, nbx, s, f_extra):
    rng = np.random.default_rng(0)
    t = 4 * s
    f = 3 * s + f_extra
    hp = nby * t + f + 7
    wp = nbx * t + f + 11
    arr = jnp.asarray(rng.random((hp, wp, 2), np.float32))
    oy0, ox0 = 3, 5

    got = windows.dense_windows(arr, jnp.int32(oy0), jnp.int32(ox0),
                                nby, nbx, t, f)
    # oracle: per-region dynamic slices
    ky, kx = np.meshgrid(np.arange(nby), np.arange(nbx), indexing="ij")
    oys = (oy0 + ky.reshape(-1) * t).astype(np.int32)
    oxs = (ox0 + kx.reshape(-1) * t).astype(np.int32)
    want = energy_mod.slice_windows(arr, jnp.asarray(oxs), jnp.asarray(oys),
                                    pad=0, off=0, size=f)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dense_windows_leading_matches():
    rng = np.random.default_rng(1)
    nby, nbx, s = 2, 3, 4
    t, f = 4 * s, 3 * s + 2
    arr = jnp.asarray(rng.random((8, nby * t + f + 3, nbx * t + f + 5),
                                 np.float32))
    got = windows.dense_windows_leading(arr, jnp.int32(2), jnp.int32(1),
                                        nby, nbx, t, f)
    ky, kx = np.meshgrid(np.arange(nby), np.arange(nbx), indexing="ij")
    oys = (2 + ky.reshape(-1) * t).astype(np.int32)
    oxs = (1 + kx.reshape(-1) * t).astype(np.int32)
    want = energy_mod.slice_windows_leading(
        arr, jnp.asarray(oxs), jnp.asarray(oys), pad=0, off=0, size=f)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dense_windows_block_exceeds_array_is_padded():
    """When the bounding block would run past the array, dense_windows must
    still match (the slice clamps; only rows beyond every window's reach are
    affected, which do not exist when callers pad correctly). Here we check
    the exact-fit case: array exactly the block size."""
    rng = np.random.default_rng(2)
    nby, nbx, s = 2, 2, 3
    t, f = 4 * s, 3 * s
    hblk = (nby - 1) * t + f
    wblk = (nbx - 1) * t + f
    arr = jnp.asarray(rng.random((hblk, wblk), np.float32))
    got = windows.dense_windows(arr[..., None], jnp.int32(0), jnp.int32(0),
                                nby, nbx, t, f)[..., 0]
    ky, kx = np.meshgrid(np.arange(nby), np.arange(nbx), indexing="ij")
    for i, (m, k) in enumerate(zip(ky.reshape(-1), kx.reshape(-1))):
        np.testing.assert_array_equal(
            np.asarray(got[i]),
            np.asarray(arr[m * t:m * t + f, k * t:k * t + f]))


def test_block_unary_matches_legacy_unary():
    """The block-layout V3 unary pipeline (slab tent + GF, all in
    [C, nby, F, nbx, F] layout) must agree with the legacy region-major
    path — same semantics, only the memory layout differs."""
    import numpy as np
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models import energy as energy_mod

    rng = np.random.default_rng(3)
    h, w, nd = 30, 41, 7
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    vol = rng.random((nd, h, w), np.float32)
    params = PARAMS_GF.replace(windR=4, th_col=0.8)
    s, nby, nbx = 3, 3, 4
    from localexpstereo_tpu.models import grid
    pad = grid.required_padding([s], params.windR)
    vol_pad = grid.required_volume_padding(w, h, [s], params.guided_radius)
    data, cfg = energy_mod.build_energy(img, img, params, float(nd - 1),
                                        pad, vol0=vol, vol1=vol,
                                        vol_pad=vol_pad)
    coy, cox = -s, -s   # color (0, 0) canvas origin
    n = nby * nbx
    iy, ix = np.divmod(np.arange(n), nbx)
    ox = (ix * 4 * s).astype(np.int32)
    oy = (iy * 4 * s).astype(np.int32)
    props = np.stack([rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n),
                      rng.uniform(0, nd - 1, n), np.zeros(n)],
                     -1).astype(np.float32)
    ss = 3 * s

    import jax.numpy as jnp
    legacy = energy_mod.unary_windows(
        data, cfg, 0, jnp.asarray(props), jnp.asarray(ox), jnp.asarray(oy),
        -s, ss)
    stat_blocks = energy_mod.dense_filter_windows_block(
        data, cfg, 0, coy, cox, s, nby, nbx, -s, ss)
    slab_block = energy_mod.dense_volume_slabs_block(
        data, cfg, 0, coy, cox, s, nby, nbx, -s, ss)
    block = energy_mod.unary_windows_block(
        data, cfg, 0, jnp.asarray(props), coy, cox, s, nby, nbx, -s, ss,
        stat_blocks, slab_block)
    np.testing.assert_allclose(np.asarray(block), np.asarray(legacy),
                               rtol=1e-5, atol=1e-5)
