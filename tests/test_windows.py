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

