"""Multi-pair data parallelism: a batch of stereo pairs sharded over the mesh.

The reference processes one pair per process (``demo.bat`` runs serially);
BASELINE.json config 3 calls for the MiddV3 15-pair batch sharded across
mesh cores. Here the whole move engine — proposals, unary + guided filter,
min-cut, canvas updates — is ``vmap``-ped over a leading pair axis and the
batch axis is sharded with ``NamedSharding(mesh, P('data'))``; every op is
batch-parallel so XLA keeps the computation communication-free except for
explicit metric reductions.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Parameters
from ..models import energy as energy_mod
from ..models import engine as engine_mod
from ..models import grid, proposals


class BatchedSolver:
    """Local-expansion stereo over a batch of same-sized pairs.

    All pairs share geometry (H, W, layers), so one compiled executable
    serves the whole batch; the batch axis shards across ``mesh``'s 'data'
    axis.
    """

    def __init__(self, ims0: np.ndarray, ims1: np.ndarray,
                 params: Parameters, max_disp: float, mesh: Mesh,
                 unit_sizes: Sequence[int],
                 layer_proposers: Optional[List] = None,
                 vols0: Optional[np.ndarray] = None,
                 vols1: Optional[np.ndarray] = None,
                 min_disp: float = 0.0, seed: int = 0):
        assert ims0.shape == ims1.shape and ims0.ndim == 4
        self.batch = ims0.shape[0]
        self.mesh = mesh
        self.params = params
        self.min_disp = float(min_disp)
        self.max_disp = float(max_disp)
        self.seed = seed
        self.unit_sizes = list(unit_sizes)
        self.layer_proposers = (layer_proposers or
                                [engine_mod.LAYER0_PROPOSERS]
                                + [engine_mod.COARSE_PROPOSERS]
                                * (len(unit_sizes) - 1))

        h, w = ims0.shape[1:3]
        pad = grid.required_padding(self.unit_sizes, params.windR)
        self.layers = grid.build_layers(w, h, self.unit_sizes)

        vol_pad = grid.required_volume_padding(
            w, h, self.unit_sizes, params.guided_radius)
        datas = []
        for b in range(self.batch):
            data, cfg = energy_mod.build_energy(
                ims0[b], ims1[b], params, max_disp, pad, min_disp,
                vol0=None if vols0 is None else vols0[b],
                vol1=None if vols1 is None else vols1[b], vol_pad=vol_pad)
            datas.append(data)
        self.cfg = cfg
        shard = NamedSharding(mesh, P("data"))
        self.data = jax.tree.map(
            lambda *xs: jax.device_put(jnp.stack(xs), shard), *datas)

    # ------------------------------------------------------------------ --

    def init(self, mode: int = 0):
        """Batched random initialization; returns sharded (labeling, cost)."""
        keys = jax.random.split(jax.random.PRNGKey(self.seed), self.batch)
        fn = jax.vmap(functools.partial(
            engine_mod.init_step, cfg=self.cfg,
            unit_size=self.layers[0].unit_size, mode=mode))
        lm, cm = fn(self.data, key=keys)
        shard = NamedSharding(self.mesh, P("data"))
        return (jax.device_put(lm, shard), jax.device_put(cm, shard))

    def sweep(self, state, outer_iter: int, do_gc: bool, mode: int = 0,
              key: Optional[jax.Array] = None):
        """One full sweep (all layers, all 16 colors) over the whole batch."""
        labeling, cost = state
        key = key if key is not None else jax.random.PRNGKey(
            self.seed + 17 * (outer_iter + 1))
        for li, layer in enumerate(self.layers):
            plan = engine_mod.make_plan(self.layer_proposers[li], outer_iter,
                                        self.min_disp, self.max_disp)
            n_random = sum(1 for st in plan if st[0] == "random")
            dzs = jnp.asarray([
                (self.max_disp - self.min_disp) * 0.5 ** (outer_iter + i + 1)
                for i in range(max(n_random, 1))], jnp.float32)
            nrs = jnp.asarray([0.5 ** (outer_iter + i)
                               for i in range(max(n_random, 1))], jnp.float32)
            for ci, (i0, j0) in enumerate(layer.colors):
                ox, oy, rmask = layer.color_regions(i0, j0)
                cox, coy = layer.canvas_origin(i0, j0)
                k = jax.random.fold_in(key, li * 100 + ci)
                keys = jax.random.split(k, self.batch)
                ox_a, oy_a = jnp.asarray(ox), jnp.asarray(oy)
                rm_a = jnp.asarray(rmask)
                cox_a, coy_a = jnp.int32(cox), jnp.int32(coy)

                def step_fn(data, lm, cm, kk, _layer=layer, _plan=plan,
                            _ox=ox_a, _oy=oy_a, _rm=rm_a, _cox=cox_a,
                            _coy=coy_a, _dzs=dzs, _nrs=nrs):
                    return engine_mod.color_step(
                        data, self.cfg, lm, cm, _ox, _oy, _rm, _cox, _coy,
                        _dzs, _nrs, kk, unit_size=_layer.unit_size,
                        nbx=_layer.nbx, nby=_layer.nby, plan=_plan,
                        do_gc=do_gc, mode=mode)

                labeling, cost = jax.vmap(step_fn)(self.data, labeling,
                                                   cost, keys)
        return labeling, cost

    def energies(self, state, mode: int = 0):
        """Per-pair (total, data, smooth) energies + the batch mean total
        (the mean reduces across the sharded axis -> one all-reduce)."""
        labeling, cost = state
        fn = jax.vmap(functools.partial(engine_mod.energy_audit,
                                        cfg=self.cfg, mode=mode))
        tot, dc, sc = fn(self.data, labeling_m=labeling, cost_m=cost)
        return (tot, dc, sc), jnp.mean(tot)

    def run(self, iterations: int, pm_iterations: int = 0, mode: int = 0):
        state = self.init(mode)
        for it in range(pm_iterations):
            state = self.sweep(state, it, False, mode)
        for it in range(iterations):
            state = self.sweep(state, it, True, mode)
        return state

    def disparities(self, state):
        """[B, H, W] disparity maps from the batched state."""
        labeling, _ = state
        p = self.cfg.pad
        lab = labeling[:, p:p + self.cfg.height, p:p + self.cfg.width]
        from ..ops import plane as plane_ops
        return jax.vmap(plane_ops.disparity_map)(lab)
