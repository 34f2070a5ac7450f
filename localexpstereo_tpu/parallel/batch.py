"""Multi-pair data parallelism: a batch of stereo pairs sharded over the mesh.

The reference processes one pair per process (``demo.bat`` runs serially);
BASELINE.json config 3 calls for the MiddV3 15-pair batch sharded across
mesh cores. Here the whole move engine — proposals, unary + guided filter,
min-cut, canvas updates — is ``vmap``-ped over a leading pair axis and the
batch axis is sharded with ``NamedSharding(mesh, P('data'))``; every op is
batch-parallel so XLA keeps the computation communication-free except for
explicit metric reductions.

Full pipeline parity with the single-pair engine (``FastGCStereo.h:133-226``
semantics under vmap): pair ``b`` of a batched run follows EXACTLY the same
schedule and RNG stream as ``LocalExpansionSolver(seed=seed+b)`` — dual-view
interleaving, per-sweep evaluation, post-processing, and checkpointing
included — so batching is purely an amortization choice. (Bit-parity
requires matching ``vol_dtype`` and backend settings on both sides; the
defaults match the single-pair engine's.)

NOTE: for the one-pair-per-chip deployment shape, prefer
``parallel.replica.ReplicaSolver`` — it runs the unchanged single-pair
program per device under ``shard_map`` and avoids this module's vmap
batching overhead.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Parameters
from ..models import energy as energy_mod
from ..models import engine as engine_mod
from ..models import grid


def post_process_batch(solver, state, p: int, h: int, w: int):
    """doDual tail as ONE batch-parallel device dispatch
    (``postprocess.post_process_batched``; VERDICT-r2 weak #7 — the
    per-pair host loop was the wrong shape for 15-pair batches). Pairs
    whose failed-pixel count overflows the static capacity re-run the
    host path, preserving exact ``PMStereoBase.h:146-256`` semantics.

    ``solver`` is any batch solver exposing ``ims0 / ims1 / params``
    (BatchedSolver and ReplicaSolver share this tail)."""
    from ..models import postprocess
    nb = solver.ims0.shape[0]     # true batch (ReplicaSolver pads waves)
    raw_dev = state[0][0][:nb, p:p + h, p:p + w]
    lab_r_dev = state[1][0][:nb, p:p + h, p:p + w]
    ll, lr, nl, nr, cap = postprocess.post_process_batched(
        raw_dev, lab_r_dev, solver.ims0, solver.ims1, solver.params,
        threshold=1.5)
    nl_h, nr_h = np.asarray(nl), np.asarray(nr)
    over = np.nonzero((nl_h > cap) | (nr_h > cap))[0]
    if over.size:
        ll_h, lr_h = np.asarray(ll), np.asarray(lr)
        for b in over:
            a, c = postprocess.post_process(
                raw_dev[b], lab_r_dev[b], solver.ims0[b], solver.ims1[b],
                solver.params, threshold=1.5)
            ll_h[b], lr_h[b] = np.asarray(a), np.asarray(c)
        ll, lr = jnp.asarray(ll_h), jnp.asarray(lr_h)
    return ll, lr


class _PairFacade:
    """Minimal per-pair view of a BatchedSolver for ``Evaluator.evaluate``
    (which needs only ``.data`` (sans volumes) and ``.cfg``)."""

    def __init__(self, data, cfg):
        self.data = data
        self.cfg = cfg


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
                 min_disp: float = 0.0, seed: int = 0,
                 vol_dtype: str = "uint8",
                 mincut_backend: Optional[str] = None):
        assert ims0.shape == ims1.shape and ims0.ndim == 4
        self.batch = ims0.shape[0]
        self.mesh = mesh
        self.params = params
        self.min_disp = float(min_disp)
        self.max_disp = float(max_disp)
        self.seed = seed
        self.ims0 = np.asarray(ims0, np.float32)
        self.ims1 = np.asarray(ims1, np.float32)
        self.unit_sizes = list(unit_sizes)
        self.layer_proposers = (layer_proposers or
                                [engine_mod.LAYER0_PROPOSERS]
                                + [engine_mod.COARSE_PROPOSERS]
                                * (len(unit_sizes) - 1))
        self.evaluators: Optional[List] = None

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
                vol1=None if vols1 is None else vols1[b], vol_pad=vol_pad,
                vol_dtype=vol_dtype)
            # The batched path stays on the XLA unary backend — drop the
            # DMA-kernel stats stack instead of replicating it per pair.
            datas.append(data._replace(gf_stack=None))
        if mincut_backend is not None:
            cfg = dataclasses.replace(cfg, mincut_backend=mincut_backend)
        # The slab hoist materializes once per vmapped pair: scale the HBM
        # budget down so large batches fall back to the gather path instead
        # of exceeding device memory. The Pallas DMA unary kernel is a
        # per-pair scalar-prefetch kernel — keep the vmapped path on XLA.
        local_pairs = -(-self.batch // max(len(mesh.devices.flat), 1))
        cfg = dataclasses.replace(
            cfg, slab_budget=cfg.slab_budget // max(local_pairs, 1),
            unary_backend="xla")
        self.cfg = cfg
        shard = NamedSharding(mesh, P("data"))
        self.data = jax.tree.map(
            lambda *xs: jax.device_put(jnp.stack(xs), shard), *datas)

    # ------------------------------------------------------------------ --

    def set_evaluators(self, evaluators: List):
        """One Evaluator per pair (or None entries); each gets its own TSV
        log / debug images, matching the single-pair engine's hook."""
        assert len(evaluators) == self.batch
        self.evaluators = evaluators

    def _pair_roots(self) -> jax.Array:
        """[B] PRNG roots: pair b replays ``LocalExpansionSolver(seed+b)``."""
        return jax.vmap(lambda b: jax.random.PRNGKey(self.seed + b))(
            jnp.arange(self.batch))

    def init(self, mode: int = 0):
        """Batched random initialization; returns sharded (labeling, cost).
        Pair b's draw equals the single-pair engine's ``init_step`` with
        root ``PRNGKey(seed + b)`` folded at 1000 + mode."""
        keys = jax.vmap(
            lambda r: jax.random.fold_in(r, 1000 + mode))(self._pair_roots())
        fn = jax.vmap(functools.partial(
            engine_mod.init_step, cfg=self.cfg,
            unit_size=self.layers[0].unit_size, mode=mode))
        lm, cm = fn(self.data, key=keys)
        shard = NamedSharding(self.mesh, P("data"))
        return (jax.device_put(lm, shard), jax.device_put(cm, shard))

    def _sweep(self, state, mode: int, outer_iter: int, do_gc: bool,
               keys_b: jax.Array):
        """One full sweep (all layers, all 16 colors) over the whole batch;
        ``keys_b`` is the per-pair sweep key [B] (the single-pair engine's
        ``fold_in(root, 2000/3000 + step)``)."""
        labeling, cost = state
        for li, layer in enumerate(self.layers):
            plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, _) = \
                engine_mod.LocalExpansionSolver._layer_inputs(
                    self, li, layer, outer_iter, jax.random.PRNGKey(0))
            ncol = len(layer.colors)
            kc = jax.vmap(lambda kb: jax.vmap(
                lambda ci: jax.random.fold_in(kb, li * 100 + ci))(
                    jnp.arange(ncol)))(keys_b)                   # [B, C]

            def one(data_b, lab_b, cost_b, keys_c, _layer=layer, _plan=plan,
                    _active=active, _oxs=oxs, _oys=oys, _rm=rmasks,
                    _coxs=coxs, _coys=coys, _dzs=dzs, _nrs=nrs):
                return engine_mod.layer_sweep(
                    data_b, self.cfg, lab_b, cost_b, _oxs, _oys, _rm,
                    _coxs, _coys, _dzs, _nrs, keys_c,
                    unit_size=_layer.unit_size, nbx=_layer.nbx,
                    nby=_layer.nby, plan=_plan, do_gc=do_gc, mode=mode,
                    step_active=_active)

            labeling, cost = jax.vmap(one)(self.data, labeling, cost, kc)
        return labeling, cost

    def sweep(self, state, outer_iter: int, do_gc: bool, mode: int = 0,
              key: Optional[jax.Array] = None):
        """One sweep with ad-hoc keys (lower-level API; ``run`` drives the
        reference schedule)."""
        key = key if key is not None else jax.random.PRNGKey(
            self.seed + 17 * (outer_iter + 1))
        keys_b = jax.random.split(key, self.batch)
        return self._sweep(state, mode, outer_iter, do_gc, keys_b)

    # --------------------------------------------------------------- run --

    def run(self, iterations: int, view_modes: Sequence[int] = (0,),
            pm_iterations: int = 0,
            checkpoint_path: Optional[str] = None,
            checkpoint_every: int = 0, resume_from: Optional[str] = None):
        """Full batched optimization mirroring ``LocalExpansionSolver.run``:
        greedy init, pm sweeps, GC sweeps with views interleaved, per-sweep
        evaluation, dual-view post-processing, checkpointing.

        Returns (final, raw): [B, H, W, 4] labelings of the left view.
        """
        roots = self._pair_roots()
        state: Dict[int, Tuple] = {}
        pm_done = gc_done = 0
        if resume_from is not None:
            from ..utils import checkpoint as ckpt_mod
            ck = ckpt_mod.load_checkpoint(resume_from)
            assert ck.pad == self.cfg.pad, "checkpoint geometry mismatch"
            for mode in view_modes:
                state[mode] = (jnp.asarray(ck.labeling[mode]),
                               jnp.asarray(ck.cost[mode]))
            pm_done = ck.pm_iterations_done
            gc_done = ck.iterations_done
        else:
            for mode in view_modes:
                state[mode] = self.init(mode)
                self._evaluate(state, mode, index=0)
        for ev in (self.evaluators or []):
            if ev is not None:
                ev.start()

        def maybe_checkpoint(pm_n, gc_n):
            if checkpoint_path and checkpoint_every:
                total = pm_n + gc_n
                if total > 0 and total % checkpoint_every == 0:
                    from ..utils import checkpoint as ckpt_mod
                    ckpt_mod.save_checkpoint(checkpoint_path, state,
                                             self.seed, pm_n, gc_n,
                                             self.cfg.pad)

        # engine.run folds 2000+step for pm sweeps, 3000+step for GC sweeps.
        step = len(view_modes) * (pm_done + gc_done)
        for it in range(pm_done, pm_iterations):
            for mode in view_modes:
                keys_b = jax.vmap(lambda r: jax.random.fold_in(
                    r, 2000 + step))(roots)
                step += 1
                state[mode] = self._sweep(state[mode], mode, it, False,
                                          keys_b)
                self._evaluate(state, mode, index=it + 1)
            maybe_checkpoint(it + 1, 0)

        for it in range(gc_done, iterations):
            for mode in view_modes:
                keys_b = jax.vmap(lambda r: jax.random.fold_in(
                    r, 3000 + step))(roots)
                step += 1
                state[mode] = self._sweep(state[mode], mode, it, True,
                                          keys_b)
                self._evaluate(state, mode, index=it + 1 + pm_iterations)
            maybe_checkpoint(pm_iterations, it + 1)

        p = self.cfg.pad
        h, w = self.cfg.height, self.cfg.width
        raw = np.asarray(state[0][0][:, p:p + h, p:p + w])
        if len(view_modes) == 2:
            ll, lr = self._post_process_batch(state, p, h, w)
            final = np.asarray(ll)
            state[0] = (state[0][0].at[:, p:p + h, p:p + w].set(ll),
                        state[0][1])
            state[1] = (state[1][0].at[:, p:p + h, p:p + w].set(lr),
                        state[1][1])
            self._evaluate(state, 0, index=iterations + 1 + pm_iterations)
            if 1 in state:
                self._evaluate(state, 1,
                               index=iterations + 1 + pm_iterations)
        else:
            final = raw
        for ev in (self.evaluators or []):
            if ev is not None:
                ev.stop()
        self._state = state
        return final, raw

    # ------------------------------------------------------------ metrics --

    def _post_process_batch(self, state, p: int, h: int, w: int):
        return post_process_batch(self, state, p, h, w)

    def _evaluate(self, state, mode: int, index: int):
        if not self.evaluators:
            return
        labeling, cost = state[mode]
        light = self.data._replace(
            vol=None, exi=None, guide=None, gf_mean=None, gf_inv=None)
        for b, ev in enumerate(self.evaluators):
            if ev is None:
                continue
            pair_data = jax.tree.map(lambda x: x[b], light)
            ev.evaluate(_PairFacade(pair_data, self.cfg), labeling[b],
                        cost[b], mode=mode, index=index)

    def energies(self, state, mode: int = 0):
        """Per-pair (total, data, smooth) energies + the batch mean total
        (the mean reduces across the sharded axis -> one all-reduce)."""
        labeling, cost = state
        fn = jax.vmap(functools.partial(engine_mod.energy_audit,
                                        cfg=self.cfg, mode=mode))
        tot, dc, sc = fn(self.data, labeling_m=labeling, cost_m=cost)
        return (tot, dc, sc), jnp.mean(tot)

    def disparities(self, state=None):
        """[B, H, W] disparity maps from the batched state."""
        labeling, _ = state if state is not None else self._state[0]
        p = self.cfg.pad
        lab = labeling[:, p:p + self.cfg.height, p:p + self.cfg.width]
        from ..ops import plane as plane_ops
        return jax.vmap(plane_ops.disparity_map)(lab)
