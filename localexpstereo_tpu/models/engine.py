"""The local-expansion move engine (reference ``FastGCStereo`` +
``PMStereoBase``).

Schedule parity with ``FastGCStereo::run`` (``FastGCStereo.h:133-226``):

  init (random label per layer-0 cell)                 -> initCurrentFast
  pm_iterations sweeps with greedy acceptance          -> doGC = false
  iterations sweeps with graph-cut acceptance          -> doGC = true
  per sweep: views interleaved, layers coarse schedule, 16 colors sequential,
  proposers [expansion, ransac, random] per region processed sequentially
  (each proposal is evaluated against the region state updated by the
  previous one).

TPU re-design: one color set = ONE jitted dispatch (`color_step`) that runs
the full proposal plan over every region of the color as fixed-shape batched
tensor ops; the 16-color sequence replaces the reference's OpenMP fork
(``FastGCStereo.h:30``). State updates write a dense per-color canvas with a
single ``dynamic_update_slice`` — the color grid guarantees disjointness, so
no scatters and no atomics are ever needed.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Parameters
from ..ops import (mincut, mincut_pallas, pairwise, windows,
                   plane as plane_ops)
from . import energy as energy_mod
from . import grid, proposals

# Proposal plan entries: ("expansion",), ("ransac",), ("random", decay_index).
#: Layer proposer sets from the reference driver (``main.cpp:300-306``):
#: layer 0 gets [Expansion(1), Ransac(1), Random(7)], coarser layers get
#: [Expansion(2), Ransac(1)].
LAYER0_PROPOSERS = ("expansion", "ransac", "random7")
COARSE_PROPOSERS = ("expansion", "expansion", "ransac")


def _mincut_dispatch(cfg, t0, t1, c00, c01, c10):
    """Selects the min-cut backend: the VMEM-resident Pallas kernel on TPU,
    the pure-XLA solver elsewhere (identical semantics, cross-tested)."""
    use_pallas = (cfg.mincut_backend == "pallas"
                  or (cfg.mincut_backend == "auto"
                      and jax.default_backend() == "tpu"))
    if use_pallas:
        return mincut_pallas.mincut_accept_pallas(t0, t1, c00, c01, c10)
    return mincut.mincut_accept(t0, t1, c00, c01, c10)


def make_plan(proposer_names: Sequence[str], outer_iter: int,
              min_disp: float, max_disp: float) -> Tuple[Tuple, ...]:
    """Expands proposer names into a static per-step plan for one sweep."""
    plan = []
    for name in proposer_names:
        if name == "expansion":
            plan.append(("expansion",))
        elif name == "ransac":
            plan.append(("ransac",))
        elif name == "random7":
            k = proposals.random_proposal_count(7, outer_iter, min_disp,
                                                max_disp)
            plan.extend(("random", i) for i in range(k))
        else:
            raise ValueError(f"unknown proposer {name}")
    return tuple(plan)


def _to_canvas(x: jnp.ndarray, nby: int, nbx: int, s: int) -> jnp.ndarray:
    """[N, 3s, 3s, ...] region tiles -> dense [nby*4s, nbx*4s, ...] canvas.

    Shared windows of one color tile the canvas at stride 4s with an s gap
    (see grid.py); the gap is zero-padded, which the accept-mask canvas turns
    into no-ops."""
    ss = 3 * s
    trail = x.shape[3:]
    x = x.reshape(nby, nbx, ss, ss, *trail)
    pad = [(0, 0), (0, 0), (0, s), (0, s)] + [(0, 0)] * len(trail)
    x = jnp.pad(x, pad)
    x = jnp.moveaxis(x, 2, 1)                 # [nby, 4s, nbx, 4s, ...]
    return x.reshape(nby * 4 * s, nbx * 4 * s, *trail)


def _slice_rows(x: jnp.ndarray, m_start, nby: int, nbx: int,
                nby_loc: int) -> jnp.ndarray:
    """Rows [m_start, m_start + nby_loc) of a row-major [nby * nbx, ...]
    region batch (m_start traced)."""
    trail = x.shape[1:]
    x = x.reshape((nby, nbx) + trail)
    x = jax.lax.dynamic_slice_in_dim(x, m_start, nby_loc, axis=0)
    return x.reshape((nby_loc * nbx,) + trail)


def _color_body(data: energy_mod.EnergyData, cfg: energy_mod.EnergyConfig,
                labeling_m: jnp.ndarray, cost_m: jnp.ndarray,
                ox: jnp.ndarray, oy: jnp.ndarray, rmask: jnp.ndarray,
                cox: jnp.ndarray, coy: jnp.ndarray,
                dzs: jnp.ndarray, nrs: jnp.ndarray, key: jax.Array,
                *, unit_size: int, nbx: int, nby: int, plan: tuple,
                do_gc: bool, mode: int, step_active=None, nby_loc: int = 0,
                m_start=None, own_rmask=None, vol_row_base=None,
                dshard=None):
    """Runs the full proposal plan of one (layer, color) for one view.

    Equivalent to the body of ``localExpansionMovesForLayer_CPU``
    (``FastGCStereo.h:22-72``) for one disjoint set, with every region of the
    set processed as one batch.

    Args:
      labeling_m, cost_m: padded per-view state [Hp, Wp, 4] / [Hp, Wp].
      ox, oy, rmask: region unit origins + validity, [N = nbx * nby].
      cox, coy: canvas origin in unpadded coords (traced scalars).
      dzs, nrs: perturbation schedules for the "random" plan entries.
      step_active: optional traced [len(plan)] bool — False entries are
        no-op steps (their proposals are evaluated but never accepted).
        Lets every outer iteration share ONE compiled plan even though the
        random-perturbation count shrinks with the decay schedule
        (``Proposer.h:149-152``), instead of recompiling per variant.
      nby_loc / m_start / own_rmask / vol_row_base: spatial-sharding mode
        (``parallel/volume.py``): proposals are still generated for ALL nby
        region rows (bit-identical RNG to the unsharded engine), but the
        expensive unary / min-cut / canvas-update path runs only on region
        rows [m_start, m_start + nby_loc), with ``own_rmask`` restricting
        acceptance to the rows this shard owns and ``vol_row_base`` mapping
        image rows into the local overlapped volume shard.
      dshard: DISPARITY-sharding mode (``parallel/dvolume.py``):
        ``(d_base, d_owned, d_total, axis_name)``. The volume slab path is
        forced and the raw sampling psums per-device owned-pixel partials
        (see ``energy.unary_windows``); everything downstream of the unary
        (min-cut, canvas) runs replicated on every device — the point of
        this mode is HBM capacity, not speedup, so redundant compute on the
        small non-volume state is the right trade.
    """
    s = unit_size
    ss = 3 * s
    t4 = 4 * s
    p = cfg.pad
    cw = jnp.clip(cfg.width - ox, 1, s)
    ch = jnp.clip(cfg.height - oy, 1, s)
    local = m_start is not None
    if local:
        assert cfg.kind == "volume", \
            "spatial sharding supports the V3 volume term (any interp mode)"
        nby_u = nby_loc
        coy_u = coy + m_start * t4
        ox_u = _slice_rows(ox, m_start, nby, nbx, nby_loc)
        oy_u = _slice_rows(oy, m_start, nby, nbx, nby_loc)
        rmask_u = own_rmask
    else:
        nby_u = nby
        coy_u = coy
        ox_u, oy_u, rmask_u = ox, oy, rmask
    tmask = energy_mod.in_image_windows(cfg, ox_u, oy_u, -s, ss) > 0
    canvas_hw = (nby_u * 4 * s, nbx * 4 * s)
    start2 = (coy_u + p, cox + p)
    # Stat windows and volume slabs are proposal-independent: slice once per
    # color step (the reference's Reusable cache, StereoEnergy.h:616-626).
    # All window extraction is DENSE (ops/windows.py): the color's regions
    # form a regular grid at stride 4s, so vmapped dynamic slices (which XLA
    # serializes) are never needed on this path.
    #
    # V3 raw-sampling backends. "blk" (the "auto" default): block-major
    # tent contraction on the un-exploded bounding block — won its
    # full-scale interleaved hardware A/B at EVERY (layer, mode) by
    # 1.18-1.40x (tools/ab_block_unary.py; ARCHITECTURE.md round-4 log),
    # labelings bit-identical to the slab path. "xla": the dense slab
    # hoist — the general fallback (interp != 1, local windows, D-sharded
    # volumes, naive/V2 all route here) and the benchmarked alternate the
    # way the reference keeps one (GuidedFilter.h:137-141). "dma"
    # (opt-in): the fused Pallas DMA gather+tent(+GF) kernel
    # (ops/unary_pallas.py), gated by the VMEM footprint of its
    # double-buffered aligned slab; not the default because the per-region
    # DMA must fetch a 128-lane-aligned superset (~4x the window's true
    # bytes at the fine layer; 19.9 vs 17.9 s/frame bf16).
    # Pruned alternates (losers on hardware; see ARCHITECTURE.md round-4
    # "unary backend A/B" table for the record): block layout (~2.5x
    # slower 5-D ops), region-on-lanes "rl" (~2% slower, transposes beat
    # lane fill), strip-mined "dma_rows" (never compiled on real TPU).
    use_vol_dma = (cfg.kind == "volume" and cfg.interp == 1 and not local
                   and dshard is None
                   and cfg.unary_backend == "dma"
                   and (jax.default_backend() == "tpu"
                        or energy_mod.DMA_INTERPRET))
    fused_gf = False
    if use_vol_dma:
        f_win = ss + 2 * cfg.params.guided_radius   # unary_windows' fsize
        sub_ = 32 if jnp.dtype(data.vol.dtype) == jnp.uint8 else 8
        fr = (f_win + sub_ - 1) // sub_ * sub_ + sub_
        d_ = int(data.vol.shape[1])
        itemsize = jnp.dtype(data.vol.dtype).itemsize
        fused_gf = (data.gf_stack is not None
                    and cfg.params.filter_name in ("GF", "GFfloat"))
        fc = (f_win + 127) // 128 * 128 + 128
        slab_bytes = 2 * d_ * fr * fc * itemsize
        if fused_gf:
            slab_bytes += 2 * 12 * fr * fc * 4
        use_vol_dma = slab_bytes <= 80 * 1024 * 1024
        fused_gf = fused_gf and use_vol_dma
    # "blk": block-major tent contraction on the un-exploded bounding
    # block (ops/unary_volume.sample_block_aligned) — kills the
    # [N, D, F, F] slab hoist and runs the VPU-bound contraction at full
    # lane fill (minor dim = block width, not F). Available to the
    # H-sharded (local-window) path too: the block resolves from the
    # local volume shard via vol_row_base, exactly like the slab path, so
    # EVERY path resolves the same backend and the sharded == single-device
    # bitwise contract holds by shared code (the round-4 multichip
    # regression was this routing diverging: blk single-device vs xla
    # sharded). "auto" is PLATFORM-GATED: blk on TPU (1.18-1.40x at every
    # layer, labelings bit-identical in the full-scale interleaved A/B,
    # tools/ab_block_unary.py), xla elsewhere — XLA:CPU compiles the blk
    # tail-quadrant contractions with shape-dependent reassociation, so a
    # row-sliced (H-sharded) blk program drifts 1-2 ulp from the full-grid
    # one and near-tie accepts flip (measured; fusion barriers don't fix
    # it). The slab ("xla") sampler is cross-shape bitwise-stable on CPU,
    # so the virtual-mesh dryrun/tests assert the bitwise contract on the
    # backend the CPU default actually resolves to.
    use_vol_blk = (cfg.kind == "volume" and cfg.interp == 1
                   and dshard is None and not use_vol_dma
                   and (cfg.unary_backend == "blk"
                        or (cfg.unary_backend == "auto"
                            and jax.default_backend() == "tpu")))
    stat_windows = vol_slabs = exi_slabs = vol_block = None
    if cfg.params.filter_name and not fused_gf:
        stat_windows = energy_mod.dense_filter_windows(
            data, cfg, mode, ox_u, oy_u, coy_u, cox, s, nby_u, nbx, -s, ss)
    if use_vol_blk:
        vol_block = (energy_mod.dense_volume_block(
            data, cfg, mode, coy_u, cox, s, nby_u, nbx, -s, ss,
            vol_row_base=vol_row_base), nby_u, nbx, t4)
    elif (cfg.kind == "volume"
            and (cfg.interp == 1 or local or dshard is not None)
            and not use_vol_dma):
        n_regions = ox_u.shape[0]
        if local or dshard is not None or energy_mod.volume_slab_bytes(
                data, n_regions, ss,
                cfg.params.guided_radius) <= cfg.slab_budget:
            vol_slabs = energy_mod.dense_volume_slabs(
                data, cfg, mode, coy_u, cox, s, nby_u, nbx, -s, ss,
                vol_row_base=vol_row_base)
    elif cfg.kind == "naive" and cfg.max_vdisp == 0.0:
        exi_slabs = energy_mod.dense_exi_slabs(
            data, cfg, mode, coy_u, cox, s, nby_u, nbx, -s, ss)

    if do_gc:
        coeff_win = windows.dense_windows_leading(
            data.coeff8[mode], coy_u + p, cox + p, nby_u, nbx, t4,
            ss)                                        # [N, 8, S, S]
        lam = cfg.params.lambda_
        tau = cfg.params.th_smooth
        use_fused = (cfg.mincut_backend == "pallas"
                     or (cfg.mincut_backend == "auto"
                         and jax.default_backend() == "tpu"))
        if not use_fused:
            coeff_fwd = coeff_win[:, list(pairwise.FORWARD)]
        # Round-structure knobs for the min-cut solve, tuned on real engine
        # state (tools/ab_mincut_knobs.py, hardware-measured): the accept
        # mask stabilizes long before the float eps-tail of trapped excess
        # drains, so capping the global-relabel rounds at 16 cuts 16-18%
        # of solve time at every layer with bit-identical accepts; at
        # S >= 256 longer push phases between relabels win additionally.
        # Safety: the in-kernel exact energy-delta guard (the repo's own
        # runtime check, mincut_pallas._make_expansion_kernel's energy-delta
        # block; the XLA path's guard is the move_energy_delta test below)
        # rejects any region whose move would raise its energy, so a
        # hypothetical truncated solve can degrade move quality only, never
        # monotonicity. (The reference has NO runtime guard — its analogue,
        # FastGCStereo.h:561-594, is a #if 0-disabled debug assertion — and
        # relies on exact BK maxflow instead.)
        # cfg 0 = auto: tuned values on the fused path; the XLA fallback
        # stays at its conservative (64, auto) defaults INTENTIONALLY so
        # CPU-generated parity pins are unaffected. Explicit cfg values
        # apply to both backends.
        gc_rounds = cfg.gc_rounds or (16 if use_fused else 64)
        gc_sweeps = cfg.gc_sweeps or ((64 if ss >= 256 else 16)
                                      if use_fused else 0)

    def step_body(idx, step, labeling_m, cost_m):
        k = jax.random.fold_in(key, idx)
        cell_labels = windows.dense_windows(labeling_m, coy + p + s,
                                            cox + p + s, nby, nbx, t4, s)
        if step[0] == "expansion":
            props = proposals.expansion(k, cell_labels, ox, oy, cw, ch)
        elif step[0] == "ransac":
            props = proposals.ransac(k, cell_labels, ox, oy, cw, ch)
        else:
            di = step[1]
            props = proposals.random_perturbation(
                k, cell_labels, ox, oy, cw, ch, dzs[di], nrs[di],
                cfg.min_disp, cfg.max_disp, cfg.max_vdisp)
        if local:
            props = _slice_rows(props, m_start, nby, nbx, nby_loc)

        pcost = energy_mod.unary_windows(
            data, cfg, mode, props, ox_u, oy_u, -s, ss, stat_windows,
            vol_slabs, exi_slabs, vol_dma=use_vol_dma, dshard=dshard,
            vol_block=vol_block)
        if step_active is not None:
            # Inactive steps (random-perturbation decay early-stop,
            # ``Proposer.h:149-152``) propose at COST_FOR_INVALID so nothing
            # is accepted and the min-cut converges immediately. (A real
            # lax.cond branch around the whole step was A/B'd: TPU
            # conditionals serialize the pipeline — 17.3 -> 22.5 s/frame —
            # so masked no-op steps are strictly better.)
            pcost = jnp.where(step_active[idx], pcost,
                              energy_mod.COST_FOR_INVALID)
        ccost = windows.dense_windows(cost_m, coy_u + p, cox + p, nby_u, nbx,
                                      t4, ss)

        if do_gc:
            halo = windows.dense_windows(labeling_m, coy_u + p - 1,
                                         cox + p - 1, nby_u, nbx, t4, ss + 2)
            tox = (ox_u - s).astype(jnp.float32)
            toy = (oy_u - s).astype(jnp.float32)
            if use_fused:
                # Fused Pallas kernel: tables + boundary t-links + graph +
                # solve + exact energy guard in one VMEM-resident pass.
                accept = mincut_pallas.expansion_accept_pallas(
                    halo, props, tox, toy, coeff_win, ccost, pcost,
                    lam=lam, tau=tau, max_global_rounds=gc_rounds,
                    sweeps_per_round=gc_sweeps)
            else:
                c00, c01, c10 = jax.vmap(
                    lambda hl, pr, cf, x0, y0: pairwise.expansion_tables(
                        hl, pr, cf, x0, y0, lam, tau)
                )(halo, props, coeff_fwd, tox, toy)
                t0b, t1b = jax.vmap(
                    lambda hl, pr, cf, x0, y0: pairwise.boundary_tlinks(
                        hl, pr, cf, x0, y0, lam, tau)
                )(halo, props, coeff_win, tox, toy)
                accept = mincut.mincut_accept(ccost + t0b, pcost + t1b,
                                              c00, c01, c10,
                                              max_global_rounds=gc_rounds,
                                              sweeps_per_round=gc_sweeps)
                # Monotonicity guard (cf. FastGCStereo.h:561-594): reject any
                # region whose move would not decrease its energy.
                delta = mincut.move_energy_delta(accept, ccost + t0b,
                                                 pcost + t1b, c00, c01, c10)
                accept &= (delta <= 0.0)[:, None, None]
        else:
            accept = mincut.greedy_accept(ccost, pcost)

        accept &= tmask & rmask_u[:, None, None]
        if step_active is not None:
            accept &= step_active[idx]

        # ---- dense canvas update (one dynamic_update_slice per array) ----
        acc_c = _to_canvas(accept, nby_u, nbx, s)
        cost_c = _to_canvas(pcost, nby_u, nbx, s)
        lab_tiles = jnp.broadcast_to(props[:, None, None, :],
                                     (props.shape[0], ss, ss, 4))
        lab_c = _to_canvas(lab_tiles, nby_u, nbx, s)

        cur_cost = jax.lax.dynamic_slice(cost_m, start2, canvas_hw)
        cost_m = jax.lax.dynamic_update_slice(
            cost_m, jnp.where(acc_c, cost_c, cur_cost), start2)
        cur_lab = jax.lax.dynamic_slice(labeling_m, start2 + (0,),
                                        canvas_hw + (4,))
        labeling_m = jax.lax.dynamic_update_slice(
            labeling_m, jnp.where(acc_c[..., None], lab_c, cur_lab),
            start2 + (0,))
        return labeling_m, cost_m

    for idx, step in enumerate(plan):
        labeling_m, cost_m = step_body(idx, step, labeling_m, cost_m)

    return labeling_m, cost_m


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "unit_size", "nbx", "nby", "plan", "do_gc",
                     "mode"))
def color_step(data, cfg, labeling_m, cost_m, ox, oy, rmask, cox, coy,
               dzs, nrs, key, *, unit_size, nbx, nby, plan, do_gc, mode,
               step_active=None):
    """One (layer, color) proposal plan as a standalone dispatch (kept for
    tests and incremental debugging; the engine uses :func:`layer_sweep`)."""
    return _color_body(data, cfg, labeling_m, cost_m, ox, oy, rmask, cox,
                       coy, dzs, nrs, key, unit_size=unit_size, nbx=nbx,
                       nby=nby, plan=plan, do_gc=do_gc, mode=mode,
                       step_active=step_active)


@functools.partial(
    jax.jit, static_argnames=("cfg", "unit_size", "nbx", "nby", "mode"))
def fusion_color_step(data, cfg, labeling_m, cost_m, ext_lab_m, ext_cost_m,
                      ox, oy, rmask, cox, coy, *, unit_size, nbx, nby, mode):
    """One (layer, color) FUSION move: every region of the color solves a
    binary min-cut choosing per pixel between the current and an external
    labeling (``fusionMoveBK``, ``FastGCStereo.h:241-410`` — implemented by
    the reference but never called from its main path; here a first-class
    sweep). The fusion graph truncates non-submodular edges exactly like
    the reference's clamp, so the exact per-region energy delta guard is
    the correctness backstop."""
    s = unit_size
    ss = 3 * s
    t4 = 4 * s
    p = cfg.pad
    tmask = energy_mod.in_image_windows(cfg, ox, oy, -s, ss) > 0
    canvas_hw = (nby * t4, nbx * t4)
    start2 = (coy + p, cox + p)
    halo0 = windows.dense_windows(labeling_m, coy + p - 1, cox + p - 1,
                                  nby, nbx, t4, ss + 2)
    halo1 = windows.dense_windows(ext_lab_m, coy + p - 1, cox + p - 1,
                                  nby, nbx, t4, ss + 2)
    ccost = windows.dense_windows(cost_m, coy + p, cox + p, nby, nbx, t4, ss)
    pcost = windows.dense_windows(ext_cost_m, coy + p, cox + p, nby, nbx,
                                  t4, ss)
    coeff_win = windows.dense_windows_leading(
        data.coeff8[mode], coy + p, cox + p, nby, nbx, t4, ss)
    coeff_fwd = coeff_win[:, list(pairwise.FORWARD)]
    lam = cfg.params.lambda_
    tau = cfg.params.th_smooth
    tox = (ox - s).astype(jnp.float32)
    toy = (oy - s).astype(jnp.float32)
    c00, c01, c10, c11 = jax.vmap(
        lambda h0, h1, cf, x0, y0: pairwise.fusion_tables(
            h0, h1, cf, x0, y0, lam, tau))(halo0, halo1, coeff_fwd, tox, toy)
    t0b, t1b = jax.vmap(
        lambda h0, h1, cf, x0, y0: pairwise.fusion_boundary_tlinks(
            h0, h1, cf, x0, y0, lam, tau))(halo0, halo1, coeff_win, tox, toy)
    t0 = ccost + t0b
    t1 = pcost + t1b
    accept = mincut.fusion_accept(t0, t1, c00, c01, c10, c11)
    delta = mincut.fusion_move_energy_delta(accept, t0, t1, c00, c01, c10,
                                            c11)
    accept &= (delta <= 0.0)[:, None, None]
    accept &= tmask & rmask[:, None, None]

    acc_c = _to_canvas(accept, nby, nbx, s)
    cost_c = _to_canvas(pcost, nby, nbx, s)
    lab_c = _to_canvas(halo1[:, 1:-1, 1:-1, :], nby, nbx, s)
    cur_cost = jax.lax.dynamic_slice(cost_m, start2, canvas_hw)
    cost_m = jax.lax.dynamic_update_slice(
        cost_m, jnp.where(acc_c, cost_c, cur_cost), start2)
    cur_lab = jax.lax.dynamic_slice(labeling_m, start2 + (0,),
                                    canvas_hw + (4,))
    labeling_m = jax.lax.dynamic_update_slice(
        labeling_m, jnp.where(acc_c[..., None], lab_c, cur_lab),
        start2 + (0,))
    return labeling_m, cost_m


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "unit_size", "nbx", "nby", "plan", "do_gc",
                     "mode"))
def layer_sweep(data: energy_mod.EnergyData, cfg: energy_mod.EnergyConfig,
                labeling_m: jnp.ndarray, cost_m: jnp.ndarray,
                oxs: jnp.ndarray, oys: jnp.ndarray, rmasks: jnp.ndarray,
                coxs: jnp.ndarray, coys: jnp.ndarray,
                dzs: jnp.ndarray, nrs: jnp.ndarray, keys: jax.Array,
                *, unit_size: int, nbx: int, nby: int, plan: tuple,
                do_gc: bool, mode: int, step_active=None):
    """ALL color steps of one layer in ONE dispatch: ``lax.scan`` over the
    color sequence (the reference's sequential j = 0..15 loop,
    ``FastGCStereo.h:26``). Inputs are stacked per color on a leading axis
    [C, ...]; the proposal plan is identical across colors of a layer, so the
    scan body traces once."""

    def body(carry, xs):
        lab, cost = carry
        ox, oy, rmask, cox, coy, key = xs
        lab, cost = _color_body(data, cfg, lab, cost, ox, oy, rmask,
                                cox, coy, dzs, nrs, key,
                                unit_size=unit_size, nbx=nbx, nby=nby,
                                plan=plan, do_gc=do_gc, mode=mode,
                                step_active=step_active)
        return (lab, cost), None

    (labeling_m, cost_m), _ = jax.lax.scan(
        body, (labeling_m, cost_m), (oxs, oys, rmasks, coxs, coys, keys))
    return labeling_m, cost_m


@functools.partial(jax.jit, static_argnames=("cfg", "unit_size", "mode",
                                             "hb_loc", "dshard_meta"))
def init_step(data: energy_mod.EnergyData, cfg: energy_mod.EnergyConfig,
              key: jax.Array, *, unit_size: int, mode: int, hb_loc: int = 0,
              m_start=None, own_rmask=None, vol_row_base=None,
              seed_labeling_m=None, dshard=None, dshard_meta=None):
    """Random per-cell initialization (``initCurrentFast``,
    ``FastGCStereo.h:94-115``): one random label at a random pixel of each
    layer-0 cell, assigned cell-wide, unary evaluated on cell + R.

    With ``seed_labeling_m`` (a padded [Hp, Wp, 4] labeling), the cell's
    label is READ from it at the cell's random pixel instead of drawn at
    random — the fast "cell" warm start of the serving path: one dispatch
    (same cost as random init) versus the reference's per-pixel warm
    evaluation (``FastGCStereo.h:117-130``, "very slow").

    The sharding kwargs mirror :func:`_color_body`: labels for ALL cells are
    drawn (bit-identical RNG), the unary runs on cell rows
    [m_start, m_start + hb_loc) only, and acceptance is limited to
    ``own_rmask`` so per-shard results merge exactly.

    D-sharding passes its traced scalars as ``dshard=(d_base, d_owned)``
    and the STATIC tail as ``dshard_meta=(d_total, axis_name)`` — this
    function is jitted, so the axis-name string cannot ride in a traced
    argument; they are recombined into :func:`_color_body`'s 4-tuple
    convention here."""
    if dshard is not None:
        dshard = tuple(dshard) + tuple(dshard_meta)
    s = unit_size
    p = cfg.pad
    wb = -(-cfg.width // s)
    hb = -(-cfg.height // s)
    jj = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 1).reshape(-1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 0).reshape(-1)
    ox = jj * s
    oy = ii * s
    cw = jnp.clip(cfg.width - ox, 1, s)
    ch = jnp.clip(cfg.height - oy, 1, s)

    kp, kl = jax.random.split(key)
    xx, yy = proposals._cell_pixel(kp, ox, oy, cw, ch)
    gx = (ox + xx).astype(jnp.float32)
    gy = (oy + yy).astype(jnp.float32)
    if seed_labeling_m is None:
        labels = plane_ops.random_label(kl, gx, gy, cfg.min_disp,
                                        cfg.max_disp, cfg.max_vdisp)
    else:
        labels = seed_labeling_m[p + oy + yy, p + ox + xx]

    local = m_start is not None
    if local:
        hb_u = hb_loc
        row0 = m_start * s
        ox_u = _slice_rows(ox, m_start, hb, wb, hb_loc)
        oy_u = _slice_rows(oy, m_start, hb, wb, hb_loc)
        labels_u = _slice_rows(labels, m_start, hb, wb, hb_loc)
        vol_slabs = energy_mod.dense_volume_slabs(
            data, cfg, mode, row0 - s, 0 - s, s, hb_u, wb, 0, s,
            vol_row_base=vol_row_base, stride=s)
        cost = energy_mod.unary_windows(data, cfg, mode, labels_u, ox_u,
                                        oy_u, 0, s, vol_slabs=vol_slabs,
                                        dshard=dshard)
        mask = (energy_mod.in_image_windows(cfg, ox_u, oy_u, 0, s) > 0)
        mask &= own_rmask[:, None, None]
    else:
        hb_u = hb
        row0 = 0
        ox_u, oy_u, labels_u = ox, oy, labels
        if dshard is not None:
            # D-sharded volume: slabs resolve from the local plane shard;
            # the psum merge happens inside unary_windows.
            vol_slabs = energy_mod.dense_volume_slabs(
                data, cfg, mode, -s, -s, s, hb, wb, 0, s, stride=s)
            cost = energy_mod.unary_windows(data, cfg, mode, labels_u, ox_u,
                                            oy_u, 0, s, vol_slabs=vol_slabs,
                                            dshard=dshard)
        elif cfg.kind == "volume" and cfg.interp == 1:
            # SAME dense-aligned sampler as the spatially-sharded init
            # above: the H-sharded solver's bitwise contract requires both
            # inits to run one sampler (the former full-volume gather path,
            # sample_windows_slab, computes the identical math with a
            # different program structure — measured 1-2 ulp apart on
            # XLA:CPU at ~1% of cells, which flips downstream near-tie
            # accepts). The engine chunks this call by cell rows when the
            # slab transient exceeds the budget (LocalExpansionSolver.
            # _init_state), preserving values exactly: the sampler is
            # per-window, so row chunking only changes batch shapes.
            vol_slabs = energy_mod.dense_volume_slabs(
                data, cfg, mode, -s, -s, s, hb, wb, 0, s, stride=s)
            cost = energy_mod.unary_windows(data, cfg, mode, labels_u, ox_u,
                                            oy_u, 0, s, vol_slabs=vol_slabs)
        else:
            cost = energy_mod.unary_windows(data, cfg, mode, labels_u, ox_u,
                                            oy_u, 0, s)
        mask = energy_mod.in_image_windows(cfg, ox_u, oy_u, 0, s) > 0

    n_u = hb_u * wb
    hp = cfg.height + 2 * p
    wp = cfg.width + 2 * p
    cost_c = _init_canvas(cost, hb_u, wb, s)
    lab_tiles = jnp.broadcast_to(labels_u[:, None, None, :], (n_u, s, s, 4))
    lab_c = _init_canvas(lab_tiles, hb_u, wb, s)
    mask_c = _init_canvas(mask, hb_u, wb, s)

    labeling_m = jnp.zeros((hp, wp, 4), jnp.float32)
    cost_m = jnp.zeros((hp, wp), jnp.float32)
    start = (p + row0, p) if local else (p, p)
    cur = jax.lax.dynamic_slice(cost_m, start, (hb_u * s, wb * s))
    cost_m = jax.lax.dynamic_update_slice(
        cost_m, jnp.where(mask_c, cost_c, cur), start)
    curl = jax.lax.dynamic_slice(labeling_m, start + (0,),
                                 (hb_u * s, wb * s, 4))
    labeling_m = jax.lax.dynamic_update_slice(
        labeling_m, jnp.where(mask_c[..., None], lab_c, curl), start + (0,))
    return labeling_m, cost_m


def _init_canvas(x: jnp.ndarray, hb: int, wb: int, s: int) -> jnp.ndarray:
    trail = x.shape[3:]
    x = x.reshape(hb, wb, s, s, *trail)
    x = jnp.moveaxis(x, 2, 1)
    return x.reshape(hb * s, wb * s, *trail)


@functools.partial(jax.jit, static_argnames=("cfg", "mode", "chunk"))
def _warmstart_chunk(data: energy_mod.EnergyData,
                     cfg: energy_mod.EnergyConfig, labels: jnp.ndarray,
                     xs: jnp.ndarray, ys: jnp.ndarray, *, mode: int,
                     chunk: int):
    """Per-pixel unary of each pixel's OWN label over a 1x1 target window
    (filter window 2R+1), the warm-start path of ``initCurrentFast``
    (``FastGCStereo.h:117-130``)."""
    q = energy_mod.unary_windows(data, cfg, mode, labels, xs, ys,
                                 target_off=0, target_size=1)
    return q[:, 0, 0]


def init_from_labeling(data: energy_mod.EnergyData,
                       cfg: energy_mod.EnergyConfig, labeling: np.ndarray,
                       mode: int, chunk: int = 8192):
    """Builds (labeling_m, cost_m) state from a given [H, W, 4] labeling by
    evaluating every pixel's unary under its own plane (warm start)."""
    h, w, p = cfg.height, cfg.width, cfg.pad
    hp, wp = h + 2 * p, w + 2 * p
    lab = np.asarray(labeling, np.float32)
    assert lab.shape == (h, w, 4)

    n = h * w
    ys, xs = np.divmod(np.arange(n, dtype=np.int32), w)
    labels_flat = lab.reshape(n, 4)
    n_pad = -(-n // chunk) * chunk
    xs = np.pad(xs, (0, n_pad - n))
    ys = np.pad(ys, (0, n_pad - n))
    labels_flat = np.pad(labels_flat, ((0, n_pad - n), (0, 0)))

    costs = np.empty(n_pad, np.float32)
    for i in range(0, n_pad, chunk):
        costs[i:i + chunk] = np.asarray(_warmstart_chunk(
            data, cfg, jnp.asarray(labels_flat[i:i + chunk]),
            jnp.asarray(xs[i:i + chunk]), jnp.asarray(ys[i:i + chunk]),
            mode=mode, chunk=chunk))

    labeling_m = jnp.zeros((hp, wp, 4), jnp.float32
                           ).at[p:p + h, p:p + w].set(lab)
    cost_m = jnp.zeros((hp, wp), jnp.float32
                       ).at[p:p + h, p:p + w].set(
        costs[:n].reshape(h, w))
    return labeling_m, cost_m


@functools.partial(jax.jit, static_argnames=("cfg",))
def energy_audit(data: energy_mod.EnergyData, cfg: energy_mod.EnergyConfig,
                 labeling_m: jnp.ndarray, cost_m: jnp.ndarray, mode):
    """(total, data, smooth) energy of a view (``Evaluator.h:119-121``)."""
    p = cfg.pad
    lab = labeling_m[p:p + cfg.height, p:p + cfg.width]
    cost = cost_m[p:p + cfg.height, p:p + cfg.width]
    coeffs = jax.lax.dynamic_slice(
        data.coeff8, (mode, 0, p, p), (1, 8, cfg.height, cfg.width))[0]
    sc = pairwise.smoothness_cost(lab, coeffs, cfg.params.lambda_,
                                  cfg.params.th_smooth)
    dc = jnp.sum(cost)
    return dc + sc, dc, sc


class LocalExpansionSolver:
    """Host-side orchestration (the reference's ``FastGCStereo`` object)."""

    def __init__(self, im0_bgr: np.ndarray, im1_bgr: np.ndarray,
                 params: Parameters, max_disp: float, min_disp: float = 0.0,
                 max_vdisp: float = 0.0, vol0: Optional[np.ndarray] = None,
                 vol1: Optional[np.ndarray] = None, seed: int = 0,
                 interp: int = 1, vol_dtype: str = "uint8",
                 stats_backend: str = "host", unary_backend: str = "auto"):
        self.im0 = np.asarray(im0_bgr, np.float32)
        self.im1 = np.asarray(im1_bgr, np.float32)
        self.params = params
        self.max_disp = float(max_disp)
        self.min_disp = float(min_disp)
        self.max_vdisp = float(max_vdisp)
        self.vol0 = vol0
        self.vol1 = vol1
        self.interp = interp
        self.vol_dtype = vol_dtype
        self.stats_backend = stats_backend
        self.unary_backend = unary_backend
        self.seed = seed
        self.unit_sizes: List[int] = []
        self.layer_proposers: List[Tuple[str, ...]] = []
        self.evaluator = None
        self.data = None
        self.cfg = None
        self.layers: List[grid.Layer] = []

    def add_layer(self, unit_size: int, proposer_names: Sequence[str]):
        """cf. ``FastGCStereo::addLayer`` (``FastGCStereo.h:88-92``)."""
        self.unit_sizes.append(int(unit_size))
        self.layer_proposers.append(tuple(proposer_names))

    def set_evaluator(self, evaluator):
        self.evaluator = evaluator

    def finalize(self):
        if self.data is not None:
            return
        h, w = self.im0.shape[:2]
        pad = grid.required_padding(self.unit_sizes, self.params.windR)
        self.layers = grid.build_layers(w, h, self.unit_sizes)
        # Geometric slab padding (volume or V2 feature images alike).
        vol_pad = grid.required_volume_padding(
            w, h, self.unit_sizes, self.params.guided_radius)
        self.data, self.cfg = energy_mod.build_energy(
            self.im0, self.im1, self.params, self.max_disp, pad,
            self.min_disp, self.max_vdisp, self.vol0, self.vol1, self.interp,
            vol_pad=vol_pad, vol_dtype=self.vol_dtype,
            stats_backend=self.stats_backend,
            dma_align=self.unary_backend == "dma")
        self.cfg = self._apply_cfg_overrides(self.cfg)

    def _apply_cfg_overrides(self, cfg):
        if self.unary_backend != "auto":
            import dataclasses
            cfg = dataclasses.replace(cfg, unary_backend=self.unary_backend)
        return cfg

    def resolved_unary_backend(self) -> str:
        """The raw-sampling backend the sweep path actually runs, i.e. what
        ``unary_backend="auto"`` resolves to for THIS solver's routing
        constraints (the matrix in ``_color_body``). Cross-path bitwise
        comparisons (dryrun step 3/5, tests) must construct both sides with
        the same resolved backend: "blk" and "xla" are NOT bitwise-equal on
        every XLA backend (round-4 lesson — XLA:CPU reassociates the two
        contractions differently).

        Matrix: V3 volume + interp==1 -> "blk" on TPU, "xla" elsewhere
        (single-device, H-sharded, replica alike — one shared routing, so
        every comparable pair resolves identically; "dma" only when
        explicitly requested AND its VMEM gate passes); V3 interp != 1 and
        D-sharded volumes -> "xla" (slab samplers); V2 naive -> "xla"
        (warp path, no backend choice)."""
        if self.unary_backend != "auto":
            return self.unary_backend
        if (self.vol0 is not None and self.interp == 1
                and jax.default_backend() == "tpu"):
            return "blk"
        return "xla"

    def update_frame(self, im0_bgr, im1_bgr, vol0=None, vol1=None,
                     seed: Optional[int] = None):
        """Serving fast path: swap in a NEW frame's tensors on a finalized
        solver without re-creating it.

        The grid layers, EnergyConfig, and therefore every compiled
        executable (jit caches key on cfg + shapes) are reused; only the
        per-frame EnergyData — GF statistics, pairwise coefficients, the
        quantized cost volume — is recomputed, as ONE jitted device
        program (``stats_backend="device"`` required: the host stats path
        computes float64 numpy stats and, for uint8, a data-dependent
        quantization range, both of which would retrace or drift cfg).
        Images/volumes may be device arrays (e.g. an on-device MC-CNN
        volume); they are consumed where they live, no host round trip.

        This is what makes the video-rate stream (``serving.StereoStream``)
        actually video-rate: the reference equivalent would be re-running
        ``FastGCStereo``'s constructor per frame (``FastGCStereo.h:76-81``,
        which recomputes ``initSmoothnessCoeff`` + GF stats on the CPU).
        """
        assert self.data is not None, "update_frame requires finalize()"
        assert self.stats_backend == "device", \
            "update_frame needs stats_backend='device' (frame-independent cfg)"
        assert (int(im0_bgr.shape[0]), int(im0_bgr.shape[1])) == \
            (self.cfg.height, self.cfg.width), "frame geometry changed"
        if seed is not None:
            self.seed = seed
        old_cfg = self.cfg
        vol_pad = grid.required_volume_padding(
            self.cfg.width, self.cfg.height, self.unit_sizes,
            self.params.guided_radius)
        data, cfg = energy_mod.build_energy(
            im0_bgr, im1_bgr, self.params, self.max_disp, self.cfg.pad,
            self.min_disp, self.max_vdisp, vol0, vol1, self.interp,
            vol_pad=vol_pad, vol_dtype=self.vol_dtype,
            stats_backend="device",
            dma_align=self.unary_backend == "dma")
        assert self._apply_cfg_overrides(cfg) == old_cfg, \
            "frame update changed the static config"
        self.data = data
        # Keep the image attributes current (the dual-view post-process
        # reads them); conversion is lazy — device arrays stay on device.
        self.im0, self.im1 = im0_bgr, im1_bgr
        self.vol0, self.vol1 = vol0, vol1

    # ------------------------------------------------------------- sweeps --

    def _layer_inputs(self, li: int, layer, outer_iter: int, key: jax.Array):
        """Packs the per-color stacked arrays + schedules of one layer (shared
        by the single-pair, batched, and spatially-sharded sweeps).

        The plan is PADDED to the outer_iter=0 variant (the longest: the
        random-perturbation count only shrinks with the decay schedule) and
        trailing no-op steps are disabled via the traced ``step_active``
        mask — so every sweep of a layer reuses one compiled executable."""
        plan = make_plan(self.layer_proposers[li], outer_iter,
                         self.min_disp, self.max_disp)
        plan_pad = make_plan(self.layer_proposers[li], 0, self.min_disp,
                             self.max_disp)
        if plan == plan_pad[:len(plan)]:
            active = np.zeros(len(plan_pad), bool)
            active[:len(plan)] = True
            plan = plan_pad
        else:  # non-prefix plan shape (custom proposer order): exact plan
            active = np.ones(len(plan), bool)
        n_random = sum(1 for st in plan if st[0] == "random")
        dzs = np.asarray([
            (self.max_disp - self.min_disp) * 0.5 ** (outer_iter + i + 1)
            for i in range(max(n_random, 1))], np.float32)
        nrs = np.asarray([0.5 ** (outer_iter + i)
                          for i in range(max(n_random, 1))], np.float32)
        oxs, oys, rmasks, coxs, coys, keys = [], [], [], [], [], []
        for ci, (i0, j0) in enumerate(layer.colors):
            ox, oy, rmask = layer.color_regions(i0, j0)
            cox, coy = layer.canvas_origin(i0, j0)
            oxs.append(ox)
            oys.append(oy)
            rmasks.append(rmask)
            coxs.append(cox)
            coys.append(coy)
            keys.append(jax.random.fold_in(key, li * 100 + ci))
        return plan, jnp.asarray(active), (
            jnp.asarray(np.stack(oxs)), jnp.asarray(np.stack(oys)),
            jnp.asarray(np.stack(rmasks)),
            jnp.asarray(coxs, jnp.int32),
            jnp.asarray(coys, jnp.int32),
            jnp.asarray(dzs), jnp.asarray(nrs), jnp.stack(keys))

    def _init_state(self, key: jax.Array, mode: int):
        """Random initialization of one view's state (overridable).

        The volume init samples dense aligned slabs (one [cells, D, F, F]
        transient); when that exceeds ``cfg.slab_budget`` it is chunked by
        CELL ROWS via the local-window init machinery — each chunk writes a
        disjoint row band into a zero canvas, so the summed canvases equal
        the single-call result bitwise (the sampler is per-window; chunking
        only changes batch shapes). The label RNG draws the full grid in
        every chunk and row-slices, so labels are chunking-invariant."""
        s = self.layers[0].unit_size
        cfg = self.cfg
        if cfg.kind == "volume" and cfg.interp == 1:
            hb = -(-cfg.height // s)
            wb = -(-cfg.width // s)
            f = s + 2 * cfg.params.guided_radius
            itemsize = jnp.dtype(self.data.vol.dtype).itemsize
            # Physical slab bytes incl. XLA's (8, 128) tile padding of the
            # trailing [F, F] dims (cf. ops.unary_volume.sample_windows_slab).
            per_row = (wb * self.data.vol.shape[1] * (-(-f // 8) * 8)
                       * (-(-f // 128) * 128) * itemsize)
            if per_row * hb > cfg.slab_budget:
                chunk = max(1, cfg.slab_budget // per_row)
                own = jnp.ones(chunk * wb, bool)
                lab = cost = None
                for m0 in range(0, hb, chunk):
                    hb_loc = min(chunk, hb - m0)
                    l_c, c_c = init_step(
                        self.data, cfg, key, unit_size=s, mode=mode,
                        hb_loc=hb_loc, m_start=m0,
                        own_rmask=own[:hb_loc * wb])
                    lab = l_c if lab is None else lab + l_c
                    cost = c_c if cost is None else cost + c_c
                return lab, cost
        return init_step(self.data, self.cfg, key, unit_size=s, mode=mode)

    def _sweep(self, state_m, mode: int, outer_iter: int, do_gc: bool,
               key: jax.Array):
        """One full sweep over all layers and colors for one view."""
        labeling_m, cost_m = state_m
        for li, layer in enumerate(self.layers):
            plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys) = \
                self._layer_inputs(li, layer, outer_iter, key)
            labeling_m, cost_m = layer_sweep(
                self.data, self.cfg, labeling_m, cost_m, oxs, oys, rmasks,
                coxs, coys, dzs, nrs, keys,
                unit_size=layer.unit_size, nbx=layer.nbx, nby=layer.nby,
                plan=plan, do_gc=do_gc, mode=mode, step_active=active)
        return labeling_m, cost_m

    def precompile(self, view_modes: Sequence[int] = (0, 1),
                   pm_iterations: int = 1, iterations: int = 1):
        """Compiles every executable a following :meth:`run` with the same
        schedule shape will dispatch — init, greedy and GC layer sweeps (the
        proposal plans are padded to the outer_iter=0 variant, so ONE sweep
        of each kind covers all outer iterations) and the dual-view
        post-process — by running a throwaway 1+1-sweep solve without the
        evaluator. Restores the reference's timing contract: ``time.txt``
        measures pure optimization (``TimeStamper.h``,
        ``Evaluator.h:113-116``), not XLA compilation of cold shapes."""
        ev, self.evaluator = self.evaluator, None
        try:
            self.run(iterations=min(iterations, 1), view_modes=view_modes,
                     pm_iterations=min(pm_iterations, 1),
                     host_outputs=False)   # throwaway: skip the D2H
        finally:
            self.evaluator = ev

    # --------------------------------------------------------------- run --

    def run(self, iterations: int, view_modes: Sequence[int] = (0, 1),
            pm_iterations: int = 0, init_labeling=None,
            init_mode: str = "exact", fuse_with=None,
            host_outputs: bool = True,
            checkpoint_path: Optional[str] = None,
            checkpoint_every: int = 0, resume_from: Optional[str] = None):
        """Full optimization (cf. ``FastGCStereo::run``). Returns
        (labeling, raw_labeling) as unpadded [H, W, 4] numpy arrays of the
        left view (plus the internal state for inspection).

        Args:
          init_labeling: optional [H, W, 4] warm-start labeling (the
            reference's non-empty ``initCurrentFast`` branch).
          init_mode: how to consume ``init_labeling`` — "exact" evaluates
            every pixel's own-label unary (reference semantics, slow);
            "cell" seeds each layer-0 cell with the labeling's value at the
            cell's random pixel, at the cost of one init dispatch (the
            serving / video-rate warm start).
          host_outputs: when False, return DEVICE arrays instead of numpy —
            serving keeps the labeling on device between frames, avoiding
            two full [H, W, 4] transfers per frame over the (slow,
            tunneled) host link.
          fuse_with: optional sequence of external labelings to fusion-move
            into the solution AFTER the GC sweeps and BEFORE the dual-view
            post-process. Each entry is an [H, W, 4] array (applied to view
            0) or a {mode: [H, W, 4]} dict; every entry is fused at every
            layer, coarsest first. This is the multi-seed / multi-source
            fusion extension the reference's unused ``fusionMoveBK`` hook
            anticipates — the result's energy is <= the pure solve's.
          checkpoint_path / checkpoint_every: save the full state every N
            completed sweeps.
          resume_from: path of a checkpoint to resume from (skips the
            already-completed sweeps).
        """
        self.finalize()
        cfg = self.cfg
        root = jax.random.PRNGKey(self.seed)
        state = {}
        pm_done = gc_done = 0
        if resume_from is not None:
            from ..utils import checkpoint as ckpt_mod
            ck = ckpt_mod.load_checkpoint(resume_from)
            assert ck.pad == cfg.pad, "checkpoint geometry mismatch"
            for mode in view_modes:
                state[mode] = (jnp.asarray(ck.labeling[mode]),
                               jnp.asarray(ck.cost[mode]))
            pm_done = ck.pm_iterations_done
            gc_done = ck.iterations_done
        else:
            for mode in view_modes:
                if init_labeling is not None and init_mode == "cell":
                    p = cfg.pad
                    lab_m = jnp.zeros(
                        (cfg.height + 2 * p, cfg.width + 2 * p, 4),
                        jnp.float32).at[p:p + cfg.height,
                                        p:p + cfg.width].set(
                        jnp.asarray(init_labeling, jnp.float32))
                    k = jax.random.fold_in(root, 1000 + mode)
                    state[mode] = init_step(
                        self.data, cfg, k,
                        unit_size=self.layers[0].unit_size, mode=mode,
                        seed_labeling_m=lab_m)
                elif init_labeling is not None:
                    state[mode] = init_from_labeling(self.data, cfg,
                                                     init_labeling, mode)
                else:
                    k = jax.random.fold_in(root, 1000 + mode)
                    state[mode] = self._init_state(k, mode)
                self._evaluate(state, mode, index=0)
        if self.evaluator is not None:
            self.evaluator.start()

        def maybe_checkpoint(pm_n, gc_n):
            if checkpoint_path and checkpoint_every:
                total = pm_n + gc_n
                if total > 0 and total % checkpoint_every == 0:
                    from ..utils import checkpoint as ckpt_mod
                    ckpt_mod.save_checkpoint(checkpoint_path, state,
                                             self.seed, pm_n, gc_n, cfg.pad)

        step = len(view_modes) * (pm_done + gc_done)
        for it in range(pm_done, pm_iterations):
            for mode in view_modes:
                k = jax.random.fold_in(root, 2000 + step)
                step += 1
                state[mode] = self._sweep(state[mode], mode, it, False, k)
                self._evaluate(state, mode, index=it + 1)
            if self.evaluator is not None and len(view_modes) == 2:
                self.evaluator.save_consistency(self, state, it + 1)
            maybe_checkpoint(it + 1, 0)

        for it in range(gc_done, iterations):
            for mode in view_modes:
                k = jax.random.fold_in(root, 3000 + step)
                step += 1
                state[mode] = self._sweep(state[mode], mode, it, True, k)
                self._evaluate(state, mode, index=it + 1 + pm_iterations)
            if self.evaluator is not None and len(view_modes) == 2:
                self.evaluator.save_consistency(self, state,
                                                it + 1 + pm_iterations)
            maybe_checkpoint(pm_iterations, it + 1)

        if fuse_with:
            self._state = state
            all_layers = tuple(reversed(range(len(self.layers))))
            for ext in fuse_with:
                for mode in view_modes:
                    lab_ext = (ext.get(mode) if isinstance(ext, dict)
                               else (ext if mode == 0 else None))
                    if lab_ext is None:
                        continue
                    # One per-pixel unary evaluation per (entry, mode); the
                    # layer loop reuses it (init_from_labeling is the
                    # expensive chunked host loop).
                    ext_lab_m, ext_cost_m = init_from_labeling(
                        self.data, cfg, np.asarray(lab_ext, np.float32),
                        mode)
                    self._fuse_layers(ext_lab_m, ext_cost_m, mode,
                                      all_layers)
            state = self._state
            if len(view_modes) == 1:
                # Dual-view runs re-evaluate after the post-process below;
                # single-view runs need their own post-fusion row so the
                # log's last entry matches the shipped labeling.
                self._evaluate(state, view_modes[0],
                               index=iterations + 1 + pm_iterations)

        raw = self._unpadded_labeling(state, 0)
        if len(view_modes) == 2:
            from . import postprocess
            lab_l = self._unpadded_labeling(state, 0)
            lab_r = self._unpadded_labeling(state, 1)
            # Device-resident fixed-shape postprocess (one dispatch, no host
            # round trips); bit-equal to the host path while the failed
            # count fits the static cap — the rare overflow falls back.
            ll, lr, nl, nr, cap = postprocess.post_process_fixed(
                lab_l, lab_r, self.im0, self.im1, self.params,
                threshold=1.5)
            if int(nl) > cap or int(nr) > cap:
                lab_l, lab_r = postprocess.post_process(
                    lab_l, lab_r, self.im0, self.im1, self.params,
                    threshold=1.5)
            else:
                lab_l, lab_r = ll, lr
            state[0] = self._set_unpadded_labeling(state[0], lab_l)
            state[1] = self._set_unpadded_labeling(state[1], lab_r)
            final = lab_l
            self._evaluate(state, 0, index=iterations + 1 + pm_iterations)
            if 1 in state:
                self._evaluate(state, 1,
                               index=iterations + 1 + pm_iterations)
        else:
            final = raw
        if self.evaluator is not None:
            self.evaluator.stop()
        self._state = state
        if host_outputs:
            final_h = np.asarray(final)
            # Single-view runs return the same array twice — one D2H
            # transfer, not two (the tunneled link makes each one count).
            raw_h = final_h if raw is final else np.asarray(raw)
            return final_h, raw_h
        return jnp.asarray(final), jnp.asarray(raw)

    def fuse(self, labeling, mode: int = 0, layer_index: int = 0):
        """Fuses an external [H, W, 4] labeling into the current solution
        with one full 16-color fusion-move sweep (the reference's unused
        ``fusionMoveBK`` hook, ``FastGCStereo.h:241-410``, as a first-class
        API — e.g. fuse two independent solves from different seeds, or a
        model-predicted plane initialization).

        The external labeling's per-pixel unary is evaluated once
        (:func:`init_from_labeling`); each region then solves a binary
        min-cut choosing per pixel between its current and external label,
        guarded to be energy-non-increasing. Updates internal state and
        returns the fused [H, W, 4] labeling (call after :meth:`run`).
        """
        assert hasattr(self, "_state"), "fuse() requires a completed run()"
        ext_lab_m, ext_cost_m = init_from_labeling(
            self.data, self.cfg, np.asarray(labeling, np.float32), mode)
        self._fuse_layers(ext_lab_m, ext_cost_m, mode, (layer_index,))
        return np.asarray(self._unpadded_labeling(self._state, mode))

    def _fuse_layers(self, ext_lab_m, ext_cost_m, mode: int,
                     layer_indices):
        """Fusion sweeps of the current state against a PRE-EVALUATED
        external state at each listed layer (shared by :meth:`fuse` and
        ``run(fuse_with=...)`` so the per-pixel unary evaluation happens
        once per external labeling, not once per layer)."""
        labeling_m, cost_m = self._state[mode]
        for li in layer_indices:
            layer = self.layers[li]
            for (i0, j0) in layer.colors:
                ox, oy, rmask = layer.color_regions(i0, j0)
                cox, coy = layer.canvas_origin(i0, j0)
                labeling_m, cost_m = fusion_color_step(
                    self.data, self.cfg, labeling_m, cost_m, ext_lab_m,
                    ext_cost_m, jnp.asarray(ox), jnp.asarray(oy),
                    jnp.asarray(rmask), jnp.int32(cox), jnp.int32(coy),
                    unit_size=layer.unit_size, nbx=layer.nbx,
                    nby=layer.nby, mode=mode)
        self._state[mode] = (labeling_m, cost_m)

    # ------------------------------------------------------------ helpers --

    def _unpadded_labeling(self, state, mode):
        p = self.cfg.pad
        lab = state[mode][0][p:p + self.cfg.height, p:p + self.cfg.width]
        return jnp.asarray(lab)

    def _set_unpadded_labeling(self, state_m, lab):
        labeling_m, cost_m = state_m
        p = self.cfg.pad
        labeling_m = labeling_m.at[p:p + self.cfg.height,
                                   p:p + self.cfg.width].set(lab)
        return labeling_m, cost_m

    def _evaluate(self, state, mode, index):
        if self.evaluator is None:
            return
        labeling_m, cost_m = state[mode]
        self.evaluator.evaluate(self, labeling_m, cost_m, mode=mode,
                                index=index)

    def disparity_map(self, mode: int = 0) -> np.ndarray:
        lab = self._unpadded_labeling(self._state, mode)
        return np.asarray(plane_ops.disparity_map(lab))
