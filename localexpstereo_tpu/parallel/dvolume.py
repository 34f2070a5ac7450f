"""Disparity-axis cost-volume sharding (BASELINE config 4 at scale).

The reference holds BOTH full ``[D, H, W]`` float volumes in RAM
(``main.cpp:353-368``); at full MiddV3 resolution (ndisp >= 400, H ~ 2000)
that exceeds a single chip's HBM even at uint8. ``parallel/volume.py``
shards along image HEIGHT, but its overlapped read-only shards need a halo
of ``8 * s_max + R`` rows — at production layer geometry (s_max = 9 % of a
2880-px width => halo ~ 2100 rows >= the whole image) every "shard" holds
nearly the full volume, so H-sharding cannot reduce residency at the scale
that motivates config 4.

This module shards the volume's DISPARITY axis instead:

- **Per-device residency is geometry-independent:** device i holds planes
  ``[i*Dq, (i+1)*Dq)`` plus ONE zero-padded halo plane on each side
  (``Dq = ceil(D / n)``), i.e. ``1/n + 2/D`` of the volume regardless of
  layer sizes — the halo is set by the d-interpolation stencil (<= 1 plane
  for nearest/linear/quadratic), not by spatial window reach.
- **Exact one-owner merge inside the unary:** each window pixel's sample
  touches at most the planes adjacent to its own plane-disparity, so the
  device owning its primary tap computes the pixel's fully finalized cost
  from local planes and every other device contributes an exact zero; a
  ``psum`` over the mesh axis reassembles the unsharded raw cost
  bit-for-bit (``unary_volume.sample_slabs_dshard``) before the guided
  filter runs.
- **Everything else replicated:** proposals, min-cut, canvas updates and
  state run identically on every device (same RNG keys, same inputs after
  the psum), so the state needs NO merge at all. The redundant compute is
  on the small non-volume tensors — config 4 is an HBM-capacity mode, not
  a speedup mode, and this keeps the communication to one [N, F, F] raw
  window psum per proposal step, riding ICI on real meshes.

Exactness contract (``tests/test_volume_dsharding.py``): the one-owner
psum MERGE is exact by construction — summing the per-device partials
reproduces the unsharded sampler BITWISE (asserted for all three
interpolation modes, incl. uint8 decode). END-TO-END the full solve
matches the single-device engine to tight float tolerance rather than
bitwise: the sharded and unsharded programs are different XLA programs,
and XLA may reassociate the quantized decode into the tent contraction
differently (observed 1-2 ulp on filtered unaries), while quadratic
additionally samples through a differently-ordered (oracle-tested)
gather path on the single-device engine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Parameters
from ..models import energy as energy_mod
from ..models import engine as engine_mod
from ..models import grid


def build_vol_dshards(vol_host: np.ndarray, n_dev: int, dq: int) -> np.ndarray:
    """[V, D, Hp, Wp] padded host volume (already in its storage dtype) ->
    [n_dev, V, dq + 2, Hp, Wp] plane shards. Device i's local plane 0 is
    GLOBAL plane ``i*dq - 1`` (its lower interpolation halo); planes outside
    [0, D) are zero (only ever read as zero-weight / masked taps). Shard
    bytes are identical to the single-device volume's — no dtype change."""
    v, d_, hp_, wp_ = vol_host.shape
    dl = dq + 2
    shards = np.zeros((n_dev, v, dl, hp_, wp_), vol_host.dtype)
    for dev in range(n_dev):
        src0 = dev * dq - 1
        lo = max(src0, 0)
        hi = min(src0 + dl, d_)
        if hi > lo:
            shards[dev, :, lo - src0:hi - src0] = vol_host[:, lo:hi]
    return shards


def _data_specs(data, axis_name):
    return energy_mod.EnergyData(
        guide=P(), gf_mean=P(), gf_inv=P(), coeff8=P(),
        exi=None if data.exi is None else P(),
        vol=P(axis_name))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "unit_size", "nbx", "nby", "plan", "do_gc",
                     "mode", "dq", "d_total", "axis_name", "mesh"))
def dsharded_layer_sweep(data, cfg, labeling_m, cost_m, oxs, oys, rmasks,
                         coxs, coys, dzs, nrs, keys, *, unit_size, nbx, nby,
                         plan, do_gc, mode, dq, d_total, axis_name, mesh,
                         step_active=None):
    """:func:`engine.layer_sweep` over a D-sharded volume: identical scan
    over the 16 colors; the unary's raw sampling psums owned-pixel partials
    (see module docstring), everything else is replicated compute."""

    def body_fn(data_sh, lab, cost, oxs, oys, rmasks, coxs, coys, dzs, nrs,
                keys, step_active):
        dev = jax.lax.axis_index(axis_name)
        data_local = data_sh._replace(vol=data_sh.vol[0])
        d_base = dev * dq
        d_owned = jnp.minimum(dq, jnp.maximum(d_total - d_base, 0))
        dshard = (d_base, d_owned, d_total, axis_name)

        def body(carry, xs):
            lab, cost = carry
            ox, oy, rmask, cox, coy, key = xs
            lab, cost = engine_mod._color_body(
                data_local, cfg, lab, cost, ox, oy, rmask, cox, coy,
                dzs, nrs, key, unit_size=unit_size, nbx=nbx, nby=nby,
                plan=plan, do_gc=do_gc, mode=mode, step_active=step_active,
                dshard=dshard)
            return (lab, cost), None

        (lab, cost), _ = jax.lax.scan(
            body, (lab, cost), (oxs, oys, rmasks, coxs, coys, keys))
        return lab, cost

    if step_active is None:
        step_active = jnp.ones(len(plan), bool)
    rep = P()
    fn = shard_map(
        body_fn, mesh=mesh,
        in_specs=(_data_specs(data, axis_name),) + (rep,) * 11,
        out_specs=(rep, rep),
        # Outputs ARE replicated (every device computes the identical state
        # from the psum-merged unaries) but the static VMA check cannot
        # prove it through _color_body.
        check_vma=False)
    return fn(data, labeling_m, cost_m, oxs, oys, rmasks, coxs, coys, dzs,
              nrs, keys, step_active)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "unit_size", "mode", "dq", "d_total", "hb_loc",
                     "axis_name", "mesh"))
def dsharded_init_step(data, cfg, key, *, unit_size, mode, dq, d_total,
                       hb_loc, axis_name, mesh, m_start=0):
    """:func:`engine.init_step` on the D-sharded volume (same label RNG;
    replicated canvases from psum-merged unaries). ``hb_loc``/``m_start``
    optionally restrict to a band of cell rows so the caller can chunk the
    whole-image init when the per-cell slab transient would not fit."""
    hb = -(-cfg.height // unit_size)
    chunked = hb_loc < hb

    def body_fn(data_sh, key, m_start):
        dev = jax.lax.axis_index(axis_name)
        data_local = data_sh._replace(vol=data_sh.vol[0])
        d_base = dev * dq
        d_owned = jnp.minimum(dq, jnp.maximum(d_total - d_base, 0))
        # init_step is jitted: traced scalars ride in dshard, the static
        # tail (plane count, axis name) in dshard_meta.
        dshard = (d_base, d_owned)
        meta = (d_total, axis_name)
        if chunked:
            wb = -(-cfg.width // unit_size)
            own = jnp.ones((hb_loc * wb,), bool)
            return engine_mod.init_step(
                data_local, cfg, key, unit_size=unit_size, mode=mode,
                hb_loc=hb_loc, m_start=m_start, own_rmask=own,
                dshard=dshard, dshard_meta=meta)
        return engine_mod.init_step(data_local, cfg, key,
                                    unit_size=unit_size, mode=mode,
                                    dshard=dshard, dshard_meta=meta)

    fn = shard_map(body_fn, mesh=mesh,
                   in_specs=(_data_specs(data, axis_name), P(), P()),
                   out_specs=(P(), P()), check_vma=False)
    return fn(data, key, jnp.asarray(m_start))


class ShardedDVolumeSolver(engine_mod.LocalExpansionSolver):
    """:class:`engine.LocalExpansionSolver` whose cost volume shards along
    the DISPARITY axis over a device mesh — the full pipeline (init, greedy
    + GC sweeps, dual view, postprocess, evaluator, checkpointing) is
    inherited and matches the single-device engine to tight float
    tolerance (module docstring: the psum merge is bitwise, the compiled
    programs differ), at ``1/n + 2/D`` volume residency per device
    independent of layer geometry (cf. ``parallel/volume.py`` whose
    H-sharding halo defeats it at production MiddV3 geometry).

    ``init_row_chunk`` bounds the whole-image init's per-call slab
    transient: the init evaluates every layer-0 cell's unary at once, and
    its dense [cells, DL, F, F] slab extraction is chunked to
    ``init_row_chunk`` cell rows per dispatch when set (0 = single call).
    """

    def __init__(self, im0_bgr, im1_bgr, params: Parameters, max_disp: float,
                 vol0: np.ndarray, vol1: np.ndarray, mesh: Mesh,
                 axis_name: str = "dshard", min_disp: float = 0.0,
                 seed: int = 0, interp: int = 1, vol_dtype: str = "uint8",
                 init_row_chunk: int = 0):
        super().__init__(im0_bgr, im1_bgr, params, max_disp,
                         min_disp=min_disp, vol0=vol0, vol1=vol1, seed=seed,
                         interp=interp, vol_dtype=vol_dtype)
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_dev = mesh.shape[axis_name]
        self.init_row_chunk = init_row_chunk

    def resolved_unary_backend(self) -> str:
        """D-sharded raw sampling always runs the slab ("xla") samplers:
        the psum-merged owned-plane partial (``sample_slabs_dshard``) has no
        block-major variant. Comparisons against a single-device reference
        must therefore build the reference with ``unary_backend="xla"``."""
        return "xla"

    def finalize(self):
        if self.data is not None:
            return
        h, w = self.im0.shape[:2]
        pad = grid.required_padding(self.unit_sizes, self.params.windR)
        self.layers = grid.build_layers(w, h, self.unit_sizes)
        vol_pad = grid.required_volume_padding(
            w, h, self.unit_sizes, self.params.guided_radius)
        self.d_total = int(self.vol0.shape[0])
        self.dq = -(-self.d_total // self.n_dev)

        def vol_transform(vol_host):
            shards = build_vol_dshards(vol_host, self.n_dev, self.dq)
            return jax.device_put(
                jnp.asarray(shards),
                NamedSharding(self.mesh, P(self.axis_name)))

        self.data, self.cfg = energy_mod.build_energy(
            self.im0, self.im1, self.params, self.max_disp, pad,
            self.min_disp, self.max_vdisp, self.vol0, self.vol1, self.interp,
            vol_pad=vol_pad, vol_dtype=self.vol_dtype,
            vol_transform=vol_transform)
        rep = NamedSharding(self.mesh, P())
        self.data = self.data._replace(
            guide=jax.device_put(self.data.guide, rep),
            gf_mean=jax.device_put(self.data.gf_mean, rep),
            gf_inv=jax.device_put(self.data.gf_inv, rep),
            coeff8=jax.device_put(self.data.coeff8, rep))

    # ------------------------------------------------------------- hooks --

    def _init_state(self, key: jax.Array, mode: int):
        s = self.layers[0].unit_size
        hb = -(-self.cfg.height // s)
        chunk = self.init_row_chunk or hb
        if chunk >= hb:
            return dsharded_init_step(
                self.data, self.cfg, key, unit_size=s, mode=mode,
                dq=self.dq, d_total=self.d_total, hb_loc=hb,
                axis_name=self.axis_name, mesh=self.mesh)
        lab = cost = None
        for m0 in range(0, hb, chunk):
            # Chunks write DISJOINT cell-row bands into zero canvases, so
            # the running sum reassembles the single-call result exactly.
            l_c, c_c = dsharded_init_step(
                self.data, self.cfg, key, unit_size=s, mode=mode,
                dq=self.dq, d_total=self.d_total,
                hb_loc=min(chunk, hb - m0), axis_name=self.axis_name,
                mesh=self.mesh, m_start=m0)
            lab = l_c if lab is None else lab + l_c
            cost = c_c if cost is None else cost + c_c
        return lab, cost

    def _sweep(self, state_m, mode: int, outer_iter: int, do_gc: bool,
               key: jax.Array):
        labeling_m, cost_m = state_m
        for li, layer in enumerate(self.layers):
            plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys) = \
                self._layer_inputs(li, layer, outer_iter, key)
            labeling_m, cost_m = dsharded_layer_sweep(
                self.data, self.cfg, labeling_m, cost_m, oxs, oys, rmasks,
                coxs, coys, dzs, nrs, keys,
                unit_size=layer.unit_size, nbx=layer.nbx, nby=layer.nby,
                plan=plan, do_gc=do_gc, mode=mode, dq=self.dq,
                d_total=self.d_total, axis_name=self.axis_name,
                mesh=self.mesh, step_active=active)
        return labeling_m, cost_m
