"""Cross-path / cross-backend consistency contracts (DEFAULT gate).

The round-4 multichip regression shipped because the engine<->sharded-solver
bitwise contract lived only in slow-marked tests: the default "auto" unary
backend resolved differently on the single-device engine (blk) and the
H-sharded solver (xla), which are not bitwise-equal programs on XLA:CPU.
These tests pin the contract in the default gate:

1. every solver that is bitwise-compared against the engine resolves the
   SAME backend as the engine (consistency by construction);
2. the exact dryrun-step-3 scenario (``__graft_entry__.dryrun_multichip``)
   runs here at the same geometry, so a plain ``pytest -q`` fails if and
   only if the driver's MULTICHIP check would fail;
3. blk and xla raw samplers are bitwise-equal AT MATCHED SHAPES (the
   property that does hold on every XLA backend), at multiple geometries
   and volume dtypes;
4. blk and xla FILTERED unaries agree to float tolerance end-to-end (the
   honest cross-backend statement on CPU — XLA:CPU compiles the two
   programs with different reassociation, so bitwise only holds on TPU,
   where the full-scale interleaved A/B showed bit-identical labelings);
5. the budget-driven row-chunked init is bitwise-equal to the single-call
   init (production MiddV3 geometry chunks; tests must prove it's exact).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models import energy as energy_mod
from localexpstereo_tpu.models.engine import LocalExpansionSolver
from localexpstereo_tpu.parallel import mesh as mesh_mod
from localexpstereo_tpu.parallel.dvolume import ShardedDVolumeSolver
from localexpstereo_tpu.parallel.volume import ShardedVolumeSolver


def _volume_problem(vh=64, vw=36, nd=6, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.random((vh, vw, 3)) * 255).astype(np.float32)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    d_true = rng.random((vh, vw), np.float32) * (nd - 1)
    vol = np.minimum(np.abs(dd - d_true[None]) * 0.4, 1.0).astype(np.float32)
    return img, vol, nd


def _build(cls, img, vol, nd, unit=3, windr=4, **kw):
    s = cls(img, img, PARAMS_GF.replace(windR=windr, lambda_=0.5,
                                        th_col=0.5),
            max_disp=float(nd - 1), vol0=vol, vol1=vol, seed=3, **kw)
    s.add_layer(unit, ("expansion", "ransac", "random7"))
    return s


def test_resolved_backend_consistent_across_paths():
    """Routing consistency by construction: every solver bitwise-compared
    against the engine must resolve unary_backend="auto" to the same
    backend the engine does (the round-4 regression was this diverging)."""
    img, vol, nd = _volume_problem(24, 20, 4)
    mesh = mesh_mod.make_mesh((2,), ("space",), jax.devices()[:2])
    ref = _build(LocalExpansionSolver, img, vol, nd)
    sh = _build(ShardedVolumeSolver, img, vol, nd, mesh=mesh)
    assert sh.resolved_unary_backend() == ref.resolved_unary_backend()
    ref.finalize()
    sh.finalize()
    assert sh.cfg.unary_backend == ref.cfg.unary_backend
    # The D-sharded solver has no blk sampler; it must SAY so, and callers
    # must compare it against a reference built with its resolved backend.
    dmesh = mesh_mod.make_mesh((2,), ("dshard",), jax.devices()[:2])
    dsh = _build(ShardedDVolumeSolver, img, vol, nd, mesh=dmesh)
    assert dsh.resolved_unary_backend() == "xla"


def test_sharded_engine_bitexact_dryrun_geometry():
    """Exactly the driver's MULTICHIP step 3 (``__graft_entry__.py``): the
    full H-sharded solve at default backends must be BIT-EXACT vs the
    single-device engine on the 8-device virtual CPU mesh. In the default
    gate so the regression class that shipped in round 4 cannot ship
    again."""
    n_dev = 8
    mesh = mesh_mod.make_mesh((n_dev,), ("space",), jax.devices()[:n_dev])
    img, vol, nd = _volume_problem(8 * n_dev, 36, 6, seed=11)
    ref = _build(LocalExpansionSolver, img, vol, nd)
    lab_ref, _ = ref.run(iterations=1, view_modes=(0,), pm_iterations=1)
    sh = _build(ShardedVolumeSolver, img, vol, nd, mesh=mesh)
    lab_sh, _ = sh.run(iterations=1, view_modes=(0,), pm_iterations=1)
    np.testing.assert_array_equal(np.asarray(lab_sh), np.asarray(lab_ref))
    # The cost state feeds subsequent sweeps — it must match too (the init
    # sampler unification is what makes this hold; see engine.init_step).
    np.testing.assert_array_equal(np.asarray(sh._state[0][1]),
                                  np.asarray(ref._state[0][1]))


@pytest.mark.parametrize("geom", [(3, 2, 6), (2, 4, 12)])
@pytest.mark.parametrize("vdtype", ["float32", "uint8"])
def test_blk_xla_raw_bitwise_matched_shapes(geom, vdtype):
    """At MATCHED shapes the blk and xla raw samplers are bitwise-equal on
    the CPU backend (both reduce over d in increasing order; the layouts
    differ but the per-pixel element order doesn't). This is the strongest
    cross-backend statement that holds off-TPU — geometries include the
    dryrun's (s=3, r=2 i.e. windR=4)."""
    from localexpstereo_tpu.ops import unary_volume as uv
    from localexpstereo_tpu.ops import windows as W

    s, r, d_ = geom
    t, f = 4 * s, 3 * s + 2 * r
    nby, nbx = 4, 5
    hp, wp = nby * t + f + 8, nbx * t + f + 8
    rng = np.random.default_rng(s * 100 + r)
    vol = (rng.random((d_, hp, wp)) * 0.9).astype(np.float32)
    scale, zero = 1.0, 0.0
    if vdtype == "uint8":
        scale = 0.9 / 255.0
        vol = np.round(vol / scale).astype(np.uint8)
    n = nby * nbx
    props = np.stack([rng.normal(0, .05, n), rng.normal(0, .05, n),
                      rng.uniform(0, d_ - 1, n),
                      np.zeros(n)], -1).astype(np.float32)
    oy0, ox0 = 3, 2
    fox = (ox0 + np.tile(np.arange(nbx), nby) * t).astype(np.int32)
    foy = (oy0 + np.repeat(np.arange(nby), nbx) * t).astype(np.int32)
    h_img, w_img = hp - 8, wp - 8

    @jax.jit
    def xla():
        slabs = W.dense_windows_leading(jnp.asarray(vol), oy0, ox0, nby,
                                        nbx, t, f)
        return uv.sample_slabs_aligned(
            slabs, jnp.asarray(props), jnp.asarray(fox), jnp.asarray(foy),
            h_img, w_img, min_disp=0.0, th_col=0.5, scale=scale, zero=zero)

    @jax.jit
    def blk():
        parts = W.dense_block_parts(jnp.asarray(vol), oy0, ox0, nby, nbx,
                                    t, f)
        return uv.sample_block_aligned(
            parts, jnp.asarray(props), fox[0], foy[0], nby, nbx, t, f,
            h_img, w_img, min_disp=0.0, th_col=0.5, scale=scale, zero=zero)

    np.testing.assert_array_equal(np.asarray(xla()), np.asarray(blk()))


@pytest.mark.parametrize("vdtype", ["float32", "uint8"])
def test_blk_xla_filtered_unary_tolerance(vdtype):
    """End-to-end (through the guided filter) the blk and xla backends agree
    to float tolerance on CPU — NOT bitwise: XLA:CPU compiles the two
    programs with different FMA/reassociation choices (the round-4 lesson;
    on TPU the full-scale A/B measured bit-identical labelings). Pins the
    honest bound so a real semantic divergence (not ulps) fails loudly."""
    from localexpstereo_tpu.models import engine as engine_mod

    img, vol, nd = _volume_problem(48, 40, 8, seed=5)
    labs = {}
    for backend in ("xla", "blk"):
        sv = _build(LocalExpansionSolver, img, vol, nd,
                    unary_backend=backend, vol_dtype=vdtype)
        sv.finalize()
        root = jax.random.PRNGKey(3)
        st = sv._init_state(jax.random.fold_in(root, 1000), 0)
        labeling_m, cost_m = st
        layer = sv.layers[0]
        plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys) = \
            sv._layer_inputs(0, layer, 0, jax.random.fold_in(root, 2000))
        labs[backend] = engine_mod.layer_sweep(
            sv.data, sv.cfg, labeling_m, cost_m, oxs, oys, rmasks, coxs,
            coys, dzs, nrs, keys, unit_size=layer.unit_size, nbx=layer.nbx,
            nby=layer.nby, plan=plan, do_gc=False, mode=0,
            step_active=active)
    c_x = np.asarray(labs["xla"][1])
    c_b = np.asarray(labs["blk"][1])
    # Costs agree to ulp-level everywhere (accepted labels may differ at
    # exact near-ties; the cost surface itself must not drift).
    assert np.abs(c_x - c_b).max() < 1e-5


def test_init_row_chunking_bitwise():
    """The budget-driven row-chunked init (production MiddV3 slab sizes
    exceed cfg.slab_budget) is bitwise-equal to the single-call init."""
    img, vol, nd = _volume_problem(40, 36, 6, seed=9)
    a = _build(LocalExpansionSolver, img, vol, nd)
    a.finalize()
    b = _build(LocalExpansionSolver, img, vol, nd)
    b.finalize()
    # Force chunking on b: budget below one full-init slab transient.
    b.cfg = dataclasses.replace(b.cfg, slab_budget=200_000)
    key = jax.random.fold_in(jax.random.PRNGKey(3), 1000)
    la, ca = a._init_state(key, 0)
    lb, cb = b._init_state(key, 0)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
