"""Disparity-axis cost-volume sharding (parallel/dvolume.py).

Exactness contract: the one-owner psum MERGE is bitwise (the summed
per-device partials equal the unsharded samplers exactly, asserted below
for all three interpolation modes including the uint8 decode); the FULL
solve matches the single-device engine to tight float tolerance — the
sharded and unsharded programs compile separately and XLA may
reassociate the decode into the tent contraction differently (1-2 ulp
on filtered unaries), which can flip near-tie accepts. (VERDICT round-3
item 5 / BASELINE config 4 at the geometry where H-sharding's halo
defeats it.)"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models.engine import LocalExpansionSolver
from localexpstereo_tpu.ops import unary_volume
from localexpstereo_tpu.parallel import mesh as mesh_mod
from localexpstereo_tpu.parallel.dvolume import (ShardedDVolumeSolver,
                                                 build_vol_dshards)


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


@pytest.mark.parametrize("quantized", [False, True])
def test_dshard_sampler_psum_matches_unsharded(quantized):
    """The owned-pixel partials of sample_slabs_dshard, summed over a
    simulated 4-way plane split, equal the unsharded samplers bitwise for
    all three interpolation modes (incl. out-of-range and NaN planes, and
    the uint8 quantized decode)."""
    rng = np.random.default_rng(0)
    n, d_, f = 6, 13, 9
    n_dev = 4
    dq = -(-d_ // n_dev)
    scale, zero = (1.0 / 255.0, 0.0) if quantized else (1.0, 0.0)
    if quantized:
        vol = rng.integers(0, 256, (d_, 64, 64)).astype(np.uint8)
    else:
        vol = rng.random((d_, 64, 64), np.float32)
    fox = jnp.asarray(rng.integers(-3, 50, n).astype(np.int32))
    foy = jnp.asarray(rng.integers(-3, 50, n).astype(np.int32))
    props = rng.uniform(-0.2, 0.2, (n, 4)).astype(np.float32)
    props[:, 2] = rng.uniform(-3, d_ + 3, n)   # incl. out-of-range planes
    props[0, 2] = np.nan                       # invalid plane
    props = jnp.asarray(props)

    # Full aligned slabs for the references.
    def slab_at(v):
        def one(o):
            return jax.lax.dynamic_slice(
                jnp.pad(jnp.asarray(v), ((0, 0), (f, f), (f, f))),
                (0, o[1] + f, o[0] + f), (v.shape[0], f, f))
        return jax.vmap(one)(jnp.stack([fox, foy], -1))

    slab_full = slab_at(vol)
    shards = build_vol_dshards(vol[None], n_dev, dq)   # [n_dev, 1, dq+2,...]

    for method in (0, 1, 2):
        if method == 1:
            ref = unary_volume.sample_slabs_aligned(
                slab_full, props, fox, foy, 64, 64, min_disp=0.0,
                th_col=0.7, scale=scale, zero=zero)
        else:
            ref = unary_volume.sample_slabs_method(
                slab_full, props, fox, foy, 64, 64, min_disp=0.0,
                max_disp=float(d_ - 1), th_col=0.7, method=method,
                scale=scale, zero=zero)
        acc = None
        for dev in range(n_dev):
            part = unary_volume.sample_slabs_dshard(
                slab_at(shards[dev, 0]), props, fox, foy, 64, 64,
                min_disp=0.0, max_disp=float(d_ - 1), th_col=0.7,
                method=method, d_base=jnp.int32(dev * dq),
                d_owned=jnp.int32(min(dq, max(d_ - dev * dq, 0))),
                d_total=d_, scale=scale, zero=zero)
            acc = part if acc is None else acc + part
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref),
                                      err_msg=f"method {method}")


@pytest.mark.slow
@pytest.mark.parametrize("n_dev", [3, 8])
def test_dsharded_full_run_matches(n_dev):
    """Full solve vs the single-device engine: float-tolerance agreement
    on labels / raw disparities / cost canvases (see module docstring for
    why bitwise cannot be promised end-to-end across the two programs)."""
    devices = jax.devices()[:n_dev]
    mesh = mesh_mod.make_mesh((n_dev,), ("dshard",), devices)
    img, vol, nd = _problem()
    unit_sizes = [3, 5]

    ref = _make(LocalExpansionSolver, img, vol, nd, unit_sizes)
    lab_ref, raw_ref = ref.run(iterations=2, view_modes=(0,),
                               pm_iterations=1)

    sh = _make(ShardedDVolumeSolver, img, vol, nd, unit_sizes, mesh=mesh)
    lab_sh, raw_sh = sh.run(iterations=2, view_modes=(0,), pm_iterations=1)

    np.testing.assert_allclose(lab_sh, lab_ref, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(raw_sh, raw_ref, atol=5e-3, rtol=1e-3)
    c_ref = np.asarray(ref._state[0][1])
    c_sh = np.asarray(sh._state[0][1])
    np.testing.assert_allclose(c_sh, c_ref, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("interp", [0, 2])
def test_dsharded_interp_modes_bitexact(interp):
    """interp=0 (nearest) matches the single-device engine BITWISE; interp=2
    (quadratic) to float tolerance only — the single-device engine samples
    quadratic through the full-volume gather path (unary_volume.
    sample_windows) while the D-sharded path reuses the slab sampler, and
    the two oracle-tested implementations order the Lagrange-polynomial
    float ops differently (~1e-4 on accepted plane coefficients)."""
    n_dev = 4
    mesh = mesh_mod.make_mesh((n_dev,), ("dshard",),
                              jax.devices()[:n_dev])
    img, vol, nd = _problem(h=29, w=40, nd=9)
    unit_sizes = [4]

    ref = _make(LocalExpansionSolver, img, vol, nd, unit_sizes,
                interp=interp, vol_dtype="float32")
    lab_ref, _ = ref.run(iterations=1, view_modes=(0,), pm_iterations=1)

    sh = _make(ShardedDVolumeSolver, img, vol, nd, unit_sizes, mesh=mesh,
               interp=interp, vol_dtype="float32")
    lab_sh, _ = sh.run(iterations=1, view_modes=(0,), pm_iterations=1)
    if interp == 0:
        np.testing.assert_array_equal(lab_sh, lab_ref)
    else:
        np.testing.assert_allclose(lab_sh, lab_ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_dsharded_chunked_init_bitexact():
    """init_row_chunk chunks the whole-image init into disjoint cell-row
    bands; the summed canvases must equal the single-call init exactly."""
    n_dev = 4
    mesh = mesh_mod.make_mesh((n_dev,), ("dshard",),
                              jax.devices()[:n_dev])
    img, vol, nd = _problem()
    a = _make(ShardedDVolumeSolver, img, vol, nd, [3], mesh=mesh)
    b = _make(ShardedDVolumeSolver, img, vol, nd, [3], mesh=mesh,
              init_row_chunk=2)
    a.finalize()
    b.finalize()
    ka = jax.random.fold_in(jax.random.PRNGKey(7), 1000)
    la, ca = a._init_state(ka, 0)
    lb, cb = b._init_state(ka, 0)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_dshard_residency_fraction():
    """Per-device bytes are ~1/n + 2/D of the full volume at ANY layer
    geometry (the property H-sharding loses at production MiddV3 scale)."""
    d_, hp, wp = 40, 64, 80
    vol = np.ones((2, d_, hp, wp), np.uint8)
    n_dev = 8
    dq = -(-d_ // n_dev)
    shards = build_vol_dshards(vol, n_dev, dq)
    per_dev = shards[0].nbytes
    assert per_dev == 2 * (dq + 2) * hp * wp
    assert per_dev / vol.nbytes == (dq + 2) / d_   # 7/40 vs 1/8 + 2/40
