"""Block-major unary backend ("blk"): oracle equality vs the slab path.

``sample_block_aligned`` evaluates the SAME per-pixel tent math as
``sample_slabs_aligned`` (the slab oracle, itself tested against the
per-pixel gather oracle of ``CostVolumeEnergy.h:69-118``) but computes it
on the un-exploded bounding block of the color grid's windows
(``ops/windows.dense_block_parts``), stitching overlap strips computed
under both owners' planes back into [N, F, F] windows. These tests pin
bitwise equality of the two layouts — overlap (F > T) and non-overlap
(F <= T) geometries, f32 and quantized uint8 storage, invalid planes,
and windows hanging off the image."""
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.ops import unary_volume, windows


def _case(s, r, nby, nbx, d=9, seed=0, dtype="float32", min_disp=0.0):
    t, f = 4 * s, 3 * s + 2 * r
    rng = np.random.default_rng(seed)
    hblk, wblk = (nby - 1) * t + f, (nbx - 1) * t + f
    pad = 3
    vol = rng.random((d, hblk + 2 * pad, wblk + 2 * pad), np.float32)
    scale, zero = 1.0, 0.0
    if dtype == "uint8":
        scale, zero = 1.0 / 255.0, 0.0
        vol = (vol * 255).astype(np.uint8)
    n = nby * nbx
    props = rng.normal(0.0, 0.05, (n, 4)).astype(np.float32)
    props[:, 2] = (rng.random(n).astype(np.float32) * (d - 1)) + min_disp
    props[min(1, n - 1), 0] = np.inf     # exercises the isfinite clamp
    # Window (0, 0) origin chosen so some windows hang off the image.
    fox0, foy0 = -5, 7
    height, width = hblk - 3, wblk - 6
    vol_j = jnp.asarray(vol)
    kw = dict(min_disp=min_disp, th_col=0.5, scale=scale, zero=zero)

    slabs = windows.dense_windows_leading(vol_j, pad, pad, nby, nbx, t, f)
    fox = jnp.asarray(fox0 + (np.arange(n) % nbx) * t, jnp.int32)
    foy = jnp.asarray(foy0 + (np.arange(n) // nbx) * t, jnp.int32)
    ref = unary_volume.sample_slabs_aligned(slabs, jnp.asarray(props),
                                            fox, foy, height, width, **kw)

    parts = windows.dense_block_parts(vol_j, pad, pad, nby, nbx, t, f)
    out = unary_volume.sample_block_aligned(
        parts, jnp.asarray(props), jnp.int32(fox0), jnp.int32(foy0),
        nby, nbx, t, f, height, width, **kw)
    return np.asarray(ref), np.asarray(out)


@pytest.mark.parametrize("dtype", ["float32", "uint8"])
def test_block_equals_slabs_overlapping(dtype):
    # F = 17 > T = 12: the fine-layer regime (strips under both owners).
    ref, out = _case(s=3, r=4, nby=4, nbx=5, dtype=dtype)
    np.testing.assert_array_equal(out, ref)


def test_block_equals_slabs_nonoverlapping():
    # F = 22 < T = 24: coarse-layer regime (no strips, gap pixels wasted).
    ref, out = _case(s=6, r=2, nby=3, nbx=3)
    np.testing.assert_array_equal(out, ref)


def test_block_equals_slabs_min_disp():
    # Same (s, r, nby, nbx) as the overlapping case so the two tests share
    # compiled executables in-process (1-core CI budget); only min_disp
    # and the random values differ.
    ref, out = _case(s=3, r=4, nby=4, nbx=5, min_disp=-2.0, seed=7)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_block_equals_slabs_single_region_rowcol():
    ref, out = _case(s=3, r=4, nby=1, nbx=2, seed=5)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_engine_backend_equivalence():
    """End-to-end: unary_backend="blk" reproduces the default solve
    bit-exactly on a tiny volume problem (both sweeps + GC). Slow lane:
    the default gate carries the raw-bitwise + filtered-tolerance +
    routing-consistency contracts (tests/test_backend_consistency.py);
    this full-engine double-compile is the weekly-cadence confirmation."""
    from localexpstereo_tpu.models.engine import LocalExpansionSolver
    rng = np.random.default_rng(3)
    h, w, nd = 36, 48, 8
    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    d_true = rng.random((h, w), np.float32) * (nd - 1)
    vol = np.minimum(np.abs(dd - d_true[None]) * 0.4, 1.0).astype(np.float32)
    params = PARAMS_GF.replace(windR=4, lambda_=0.5, th_col=0.5)
    labs = []
    for backend in ("xla", "blk"):
        s = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                                 vol0=vol, vol1=vol, seed=3,
                                 vol_dtype="uint8", unary_backend=backend)
        s.add_layer(4, ("expansion", "ransac", "random7"))
        s.finalize()
        lab, _ = s.run(iterations=1, view_modes=(0,), pm_iterations=1)
        labs.append(np.asarray(lab))
    np.testing.assert_array_equal(labs[0], labs[1])
