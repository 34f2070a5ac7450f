"""Engine-level cost-volume sharding (BASELINE config 4).

The reference holds BOTH full ``[D, H, W]`` float volumes in RAM
(``main.cpp:353-368``); at full MiddV3 resolution that exceeds a single
chip's HBM. Here the volume shards along image height across the mesh's
``space`` axis and the FULL solver (init + greedy + graph-cut sweeps +
postprocess) runs on the sharded volume, **bit-for-bit equal** to the
single-device engine:

- **Overlapped read-only shards.** Each device holds volume rows
  ``[d*Hq - halo, (d+1)*Hq + halo)`` (halo = max window reach of any layer,
  built once on the host), so per-region slab extraction never needs a
  runtime halo exchange — the classic trade of a little HBM for zero
  per-step communication on the read-only operand.
- **Full-set proposal RNG.** Proposals are still drawn for every region of
  a color from the replicated labeling (keys and draw shapes identical to
  the unsharded engine), so the random streams match exactly; only the
  expensive unary / min-cut / canvas-update path is row-sliced to the
  shard's owned region rows (``engine._color_body`` sharding kwargs).
- **Exact state merge.** After each color step the devices' state updates
  are disjoint by the 16-color geometry (same-color shared windows of
  adjacent owned rows are >= s apart), so a ``psum`` of value-changed
  pixels reassembles the replicated state exactly (no floating-point
  resummation: each changed pixel has exactly one writer).

Communication per color step = one psum over the padded state planes
(5 x Hp x Wp floats), riding ICI on real meshes.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Parameters
from ..models import energy as energy_mod
from ..models import engine as engine_mod
from ..models import grid


def _merge_state(old_lab, old_cost, new_lab, new_cost, axis_name):
    """Reassembles the replicated state from per-shard updates; exact as
    long as every changed pixel has a unique writer (see module docstring).
    """
    changed = (new_cost != old_cost) | jnp.any(new_lab != old_lab, axis=-1)
    cnt = jax.lax.psum(changed.astype(jnp.float32), axis_name)
    sum_cost = jax.lax.psum(jnp.where(changed, new_cost, 0.0), axis_name)
    sum_lab = jax.lax.psum(jnp.where(changed[..., None], new_lab, 0.0),
                           axis_name)
    lab = jnp.where((cnt > 0.0)[..., None], sum_lab, old_lab)
    cost = jnp.where(cnt > 0.0, sum_cost, old_cost)
    return lab, cost


def build_vol_shards(vol_host: np.ndarray, n_dev: int, hq: int, halo: int,
                     vol_pad: int) -> np.ndarray:
    """[V, D, Hp, Wp] padded host volume (already in its storage dtype) ->
    [n_dev, V, D, Hq + 2*halo, Wp] overlapped shards. Device d's local row 0
    is image row ``d*hq - halo``; rows outside the padded volume are zero
    (reads there are masked downstream, same as the padded volume's own zero
    margin). No dtype conversion happens here — shard bytes are identical to
    the single-device volume's."""
    v, d_, hp_, wp_ = vol_host.shape
    hl = hq + 2 * halo
    shards = np.zeros((n_dev, v, d_, hl, wp_), vol_host.dtype)
    for dev in range(n_dev):
        src0 = dev * hq - halo + vol_pad   # padded-volume row of local row 0
        lo = max(src0, 0)
        hi = min(src0 + hl, hp_)
        if hi > lo:
            shards[dev, :, :, lo - src0:hi - src0] = vol_host[:, :, lo:hi]
    return shards


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "unit_size", "nbx", "nby", "plan", "do_gc",
                     "mode", "hq", "nby_loc", "halo", "axis_name", "mesh"))
def sharded_layer_sweep(data, cfg, labeling_m, cost_m, oxs, oys, rmasks,
                        coxs, coys, dzs, nrs, keys, *, unit_size, nbx, nby,
                        plan, do_gc, mode, hq, nby_loc, halo, axis_name,
                        mesh, step_active=None):
    """:func:`engine.layer_sweep` over an H-sharded volume: identical scan
    over the 16 colors, with each device running the proposal plan on its
    owned region rows and the state psum-merged after every color."""
    s = unit_size
    t4 = 4 * s

    def body_fn(data_sh, lab, cost, oxs, oys, rmasks, coxs, coys, dzs, nrs,
                keys, step_active):
        dev = jax.lax.axis_index(axis_name)
        data_local = data_sh._replace(vol=data_sh.vol[0])
        vol_row_base = halo - dev * hq

        def body(carry, xs):
            lab, cost = carry
            ox, oy, rmask, cox, coy, key = xs
            m_start = jnp.clip((dev * hq - (coy + s)) // t4, 0,
                               max(nby - nby_loc, 0))
            oy_l = engine_mod._slice_rows(oy, m_start, nby, nbx, nby_loc)
            rm_l = engine_mod._slice_rows(rmask, m_start, nby, nbx, nby_loc)
            own = (oy_l >= dev * hq) & (oy_l < (dev + 1) * hq)
            new_lab, new_cost = engine_mod._color_body(
                data_local, cfg, lab, cost, ox, oy, rmask, cox, coy,
                dzs, nrs, key, unit_size=s, nbx=nbx, nby=nby, plan=plan,
                do_gc=do_gc, mode=mode, step_active=step_active,
                nby_loc=nby_loc, m_start=m_start,
                own_rmask=rm_l & own, vol_row_base=vol_row_base)
            lab, cost = _merge_state(lab, cost, new_lab, new_cost, axis_name)
            return (lab, cost), None

        (lab, cost), _ = jax.lax.scan(
            body, (lab, cost), (oxs, oys, rmasks, coxs, coys, keys))
        return lab, cost

    data_specs = energy_mod.EnergyData(
        guide=P(), gf_mean=P(), gf_inv=P(), coeff8=P(),
        exi=None if data.exi is None else P(),
        vol=P(axis_name))
    rep = P()
    if step_active is None:
        step_active = jnp.ones(len(plan), bool)
    fn = shard_map(
        body_fn, mesh=mesh,
        in_specs=(data_specs,) + (rep,) * 11,
        out_specs=(rep, rep),
        # Outputs ARE replicated (the psum-where merge reassembles identical
        # state on every shard) but the static VMA check cannot prove it.
        check_vma=False)
    return fn(data, labeling_m, cost_m, oxs, oys, rmasks, coxs, coys, dzs,
              nrs, keys, step_active)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "unit_size", "mode", "hq", "hb_loc", "halo",
                     "axis_name", "mesh"))
def sharded_init_step(data, cfg, key, *, unit_size, mode, hq, hb_loc, halo,
                      axis_name, mesh):
    """:func:`engine.init_step` on the sharded volume (same label RNG; each
    device evaluates the unary of its owned cell rows; psum merge)."""
    s = unit_size
    hb = -(-cfg.height // s)

    def body_fn(data_sh, key):
        dev = jax.lax.axis_index(axis_name)
        data_local = data_sh._replace(vol=data_sh.vol[0])
        m_start = jnp.clip((dev * hq) // s, 0, max(hb - hb_loc, 0))
        wb = -(-cfg.width // s)
        ms = m_start + jax.lax.broadcasted_iota(jnp.int32, (hb_loc, wb),
                                                0).reshape(-1)
        oy_l = ms * s
        own = (oy_l >= dev * hq) & (oy_l < (dev + 1) * hq)
        lab, cost = engine_mod.init_step(
            data_local, cfg, key, unit_size=s, mode=mode, hb_loc=hb_loc,
            m_start=m_start, own_rmask=own, vol_row_base=halo - dev * hq)
        zeros_l = jnp.zeros_like(lab)
        zeros_c = jnp.zeros_like(cost)
        return _merge_state(zeros_l, zeros_c, lab, cost, axis_name)

    data_specs = energy_mod.EnergyData(
        guide=P(), gf_mean=P(), gf_inv=P(), coeff8=P(),
        exi=None if data.exi is None else P(),
        vol=P(axis_name))
    fn = shard_map(body_fn, mesh=mesh, in_specs=(data_specs, P()),
                   out_specs=(P(), P()), check_vma=False)
    return fn(data, key)


class ShardedVolumeSolver(engine_mod.LocalExpansionSolver):
    """:class:`engine.LocalExpansionSolver` whose cost volume shards along
    image height over a device mesh — the full pipeline (init, greedy + GC
    sweeps, dual view, postprocess, evaluator, checkpointing) is inherited
    and produces bit-identical results to the single-device engine.

    Use when ``2 * ndisp * H * W * itemsize`` exceeds one device's HBM
    budget (the reference's in-RAM volumes, ``main.cpp:353-368``, mapped per
    SURVEY.md section 5)."""

    def __init__(self, im0_bgr, im1_bgr, params: Parameters, max_disp: float,
                 vol0: np.ndarray, vol1: np.ndarray, mesh: Mesh,
                 axis_name: str = "space", min_disp: float = 0.0,
                 seed: int = 0, interp: int = 1,
                 vol_dtype: str = "uint8", unary_backend: str = "auto"):
        super().__init__(im0_bgr, im1_bgr, params, max_disp,
                         min_disp=min_disp, vol0=vol0, vol1=vol1, seed=seed,
                         interp=interp, vol_dtype=vol_dtype,
                         unary_backend=unary_backend)
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_dev = mesh.shape[axis_name]

    def finalize(self):
        if self.data is not None:
            return
        h, w = self.im0.shape[:2]
        pad = grid.required_padding(self.unit_sizes, self.params.windR)
        self.layers = grid.build_layers(w, h, self.unit_sizes)
        vol_pad = grid.required_volume_padding(
            w, h, self.unit_sizes, self.params.guided_radius)
        self.hq = -(-h // self.n_dev)
        # Max read reach of any layer's slab block beyond the owned rows
        # (see sharding analysis in the module docstring of engine.py edits):
        # coarse layers reach ~6s + r; 8s + r leaves slack for the clamped
        # m_start at the mesh edges.
        self.halo = 8 * max(self.unit_sizes) + self.params.guided_radius

        def vol_transform(vol_host):
            shards = build_vol_shards(vol_host, self.n_dev, self.hq,
                                      self.halo, vol_pad)
            return jax.device_put(
                jnp.asarray(shards),
                NamedSharding(self.mesh, P(self.axis_name)))

        self.data, self.cfg = energy_mod.build_energy(
            self.im0, self.im1, self.params, self.max_disp, pad,
            self.min_disp, self.max_vdisp, self.vol0, self.vol1, self.interp,
            vol_pad=vol_pad, vol_dtype=self.vol_dtype,
            vol_transform=vol_transform)
        # Honor the same backend resolution as the single-device engine it
        # must bit-match (round-4 multichip regression: a routing mismatch
        # here shipped blk-vs-xla divergence on XLA:CPU).
        self.cfg = self._apply_cfg_overrides(self.cfg)
        # Replicate the non-volume tensors across the mesh explicitly.
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
        hb_loc = min(hb, -(-self.hq // s) + 1)
        return sharded_init_step(
            self.data, self.cfg, key, unit_size=s, mode=mode, hq=self.hq,
            hb_loc=hb_loc, halo=self.halo, axis_name=self.axis_name,
            mesh=self.mesh)

    def _sweep(self, state_m, mode: int, outer_iter: int, do_gc: bool,
               key: jax.Array):
        labeling_m, cost_m = state_m
        for li, layer in enumerate(self.layers):
            plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys) = \
                self._layer_inputs(li, layer, outer_iter, key)
            t4 = 4 * layer.unit_size
            nby_loc = min(layer.nby, -(-self.hq // t4) + 1)
            labeling_m, cost_m = sharded_layer_sweep(
                self.data, self.cfg, labeling_m, cost_m, oxs, oys, rmasks,
                coxs, coys, dzs, nrs, keys,
                unit_size=layer.unit_size, nbx=layer.nbx, nby=layer.nby,
                plan=plan, do_gc=do_gc, mode=mode, hq=self.hq,
                nby_loc=nby_loc, halo=self.halo, axis_name=self.axis_name,
                mesh=self.mesh, step_active=active)
        return labeling_m, cost_m
