"""Per-phase timing breakdown of the solver hot path on the real device.

Runs the bench workload's layers and times, per (layer, do_gc):
  - full color_step latency (one dispatch),
  - sub-phases re-dispatched standalone: slab slicing, proposal generation,
    unary eval, pairwise tables + t-links, min-cut, canvas update.

Usage:  python tools/profile_phases.py [scale]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem
from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models import energy as energy_mod
from localexpstereo_tpu.models import proposals
from localexpstereo_tpu.models.engine import (LocalExpansionSolver,
                                              LAYER0_PROPOSERS,
                                              COARSE_PROPOSERS, color_step,
                                              init_step, make_plan,
                                              _mincut_dispatch)
from localexpstereo_tpu.ops import mincut, mincut_pallas, pairwise


def timeit(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    img, vol, h, w, nd = build_problem(scale)
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    solver = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                                  vol0=vol, vol1=vol, seed=0)
    solver.add_layer(max(1, int(w * 0.01)), LAYER0_PROPOSERS)
    solver.add_layer(max(1, int(w * 0.03)), COARSE_PROPOSERS)
    solver.add_layer(max(1, int(w * 0.09)), COARSE_PROPOSERS)
    solver.finalize()
    data, cfg = solver.data, solver.cfg
    jax.block_until_ready(data)

    key = jax.random.PRNGKey(0)
    state = init_step(data, cfg, key, unit_size=solver.layers[0].unit_size,
                      mode=0)
    labeling_m, cost_m = state
    # one greedy sweep to get a realistic state
    labeling_m, cost_m = solver._sweep((labeling_m, cost_m), 0, 0, False,
                                       jax.random.fold_in(key, 1))
    jax.block_until_ready((labeling_m, cost_m))

    for li, layer in enumerate(solver.layers):
        plan = make_plan(solver.layer_proposers[li], 1, cfg.min_disp,
                         cfg.max_disp)
        n_random = max(sum(1 for st in plan if st[0] == "random"), 1)
        dzs = jnp.asarray([(cfg.max_disp - cfg.min_disp) * 0.5 ** (2 + i)
                           for i in range(n_random)], jnp.float32)
        nrs = jnp.asarray([0.5 ** (1 + i) for i in range(n_random)],
                          jnp.float32)
        i0, j0 = layer.colors[5 % len(layer.colors)]
        ox_, oy_, rmask_ = layer.color_regions(i0, j0)
        cox, coy = layer.canvas_origin(i0, j0)
        ox, oy, rmask = jnp.asarray(ox_), jnp.asarray(oy_), jnp.asarray(rmask_)
        s = layer.unit_size
        ss = 3 * s
        n = ox.shape[0]
        print(f"\n== layer {li}: s={s} S={ss} regions/color={n} "
              f"colors={len(layer.colors)}")

        for do_gc in (False, True):
            t, _ = timeit(
                color_step, data, cfg, labeling_m, cost_m, ox, oy, rmask,
                jnp.int32(cox), jnp.int32(coy), dzs, nrs, key,
                unit_size=s, nbx=layer.nbx, nby=layer.nby, plan=plan,
                do_gc=do_gc, mode=0)
            print(f"  color_step do_gc={do_gc}: {t*1e3:8.2f} ms  "
                  f"(plan len {len(plan)})")

        # ---- sub-phases (standalone dispatches) ----
        p = cfg.pad
        t_slab = 0.0
        vol_slabs = None
        if cfg.kind == "volume":
            if energy_mod.volume_slab_bytes(data, n, ss,
                                            cfg.params.guided_radius) <= (2 << 30):
                t_slab, vol_slabs = timeit(
                    jax.jit(energy_mod.slice_volume_slabs,
                            static_argnames=("cfg", "mode", "target_off",
                                             "target_size")),
                    data, cfg, 0, ox, oy, target_off=-s, target_size=ss)
        t_stats, stat_windows = timeit(
            jax.jit(energy_mod.slice_filter_windows,
                    static_argnames=("cfg", "mode", "target_off", "target_size")),
            data, cfg, 0, ox, oy, target_off=-s, target_size=ss)

        cw = jnp.clip(cfg.width - ox, 1, s)
        ch = jnp.clip(cfg.height - oy, 1, s)
        cell_labels = energy_mod.slice_windows(labeling_m, ox, oy, p, 0, s)
        t_prop, props = timeit(jax.jit(proposals.ransac), key, cell_labels,
                               ox, oy, cw, ch)

        unary_fn = jax.jit(energy_mod.unary_windows,
                           static_argnames=("cfg", "mode", "target_off",
                                            "target_size"))
        t_unary, pcost = timeit(unary_fn, data, cfg, 0, props, ox, oy,
                                target_off=-s, target_size=ss,
                                stat_windows=stat_windows,
                                vol_slabs=vol_slabs)
        ccost = energy_mod.slice_windows(cost_m, ox, oy, p, -s, ss)

        coeff_win = energy_mod.slice_windows_leading(
            data.coeff8[0], ox, oy, p, -s, ss)
        coeff_fwd = coeff_win[:, list(pairwise.FORWARD)]
        halo = energy_mod.slice_windows(labeling_m, ox, oy, p, -s - 1, ss + 2)
        tox = (ox - s).astype(jnp.float32)
        toy = (oy - s).astype(jnp.float32)

        @jax.jit
        def tables(halo, props, coeff_fwd, coeff_win, tox, toy):
            c00, c01, c10 = jax.vmap(
                lambda hl, pr, cf, x0, y0: pairwise.expansion_tables(
                    hl, pr, cf, x0, y0, cfg.params.lambda_,
                    cfg.params.th_smooth))(halo, props, coeff_fwd, tox, toy)
            t0b, t1b = jax.vmap(
                lambda hl, pr, cf, x0, y0: pairwise.boundary_tlinks(
                    hl, pr, cf, x0, y0, cfg.params.lambda_,
                    cfg.params.th_smooth))(halo, props, coeff_win, tox, toy)
            return c00, c01, c10, t0b, t1b

        t_tab, (c00, c01, c10, t0b, t1b) = timeit(
            tables, halo, props, coeff_fwd, coeff_win, tox, toy)

        t_cut, accept = timeit(
            lambda *a: _mincut_dispatch(cfg, *a),
            ccost + t0b, pcost + t1b, c00, c01, c10)
        t_guard, _ = timeit(jax.jit(mincut.move_energy_delta), accept,
                            ccost + t0b, pcost + t1b, c00, c01, c10)

        print(f"  slab={t_slab*1e3:7.2f}  stats={t_stats*1e3:7.2f}  "
              f"prop={t_prop*1e3:7.2f}  unary={t_unary*1e3:7.2f}  "
              f"tables={t_tab*1e3:7.2f}  mincut={t_cut*1e3:7.2f}  "
              f"guard={t_guard*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
