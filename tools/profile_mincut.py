"""Min-cut kernel convergence study on realistic layer-0 inputs.

Captures real (t0, t1, c00, c01, c10) from the bench problem at each layer,
then sweeps kernel knobs: rounds/sweeps cadence, VMEM packing budget.
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
                                              COARSE_PROPOSERS,
                                              init_step)
from localexpstereo_tpu.ops import mincut, mincut_pallas, pairwise


def timeit(fn, *args, n=5, **kw):
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

    key = jax.random.PRNGKey(0)
    labeling_m, cost_m = init_step(data, cfg, key,
                                   unit_size=solver.layers[0].unit_size,
                                   mode=0)
    labeling_m, cost_m = solver._sweep((labeling_m, cost_m), 0, 0, False,
                                       jax.random.fold_in(key, 1))
    jax.block_until_ready((labeling_m, cost_m))

    for li, layer in enumerate(solver.layers):
        s = layer.unit_size
        ss = 3 * s
        i0, j0 = layer.colors[5 % len(layer.colors)]
        ox_, oy_, _ = layer.color_regions(i0, j0)
        ox, oy = jnp.asarray(ox_), jnp.asarray(oy_)
        p = cfg.pad
        cw = jnp.clip(cfg.width - ox, 1, s)
        ch = jnp.clip(cfg.height - oy, 1, s)
        cell_labels = energy_mod.slice_windows(labeling_m, ox, oy, p, 0, s)
        props = proposals.expansion(key, cell_labels, ox, oy, cw, ch)
        pcost = energy_mod.unary_windows(data, cfg, 0, props, ox, oy, -s, ss)
        ccost = energy_mod.slice_windows(cost_m, ox, oy, p, -s, ss)
        halo = energy_mod.slice_windows(labeling_m, ox, oy, p, -s - 1, ss + 2)
        coeff_win = energy_mod.slice_windows_leading(
            data.coeff8[0], ox, oy, p, -s, ss)
        coeff_fwd = coeff_win[:, list(pairwise.FORWARD)]
        tox = (ox - s).astype(jnp.float32)
        toy = (oy - s).astype(jnp.float32)
        lam, tau = cfg.params.lambda_, cfg.params.th_smooth
        c00, c01, c10 = jax.vmap(
            lambda hl, pr, cf, x0, y0: pairwise.expansion_tables(
                hl, pr, cf, x0, y0, lam, tau))(halo, props, coeff_fwd, tox,
                                               toy)
        t0b, t1b = jax.vmap(
            lambda hl, pr, cf, x0, y0: pairwise.boundary_tlinks(
                hl, pr, cf, x0, y0, lam, tau))(halo, props, coeff_win, tox,
                                               toy)
        t0 = ccost + t0b
        t1 = pcost + t1b
        n = t0.shape[0]
        print(f"\n== layer {li}: S={ss} N={n}")

        # rounds actually used by the XLA solver
        acc, rounds, left = mincut.mincut_accept(t0, t1, c00, c01, c10,
                                                 with_stats=True)
        print(f"  XLA solver rounds used: {int(rounds)}  active left:"
              f" {int(left)}  accept frac {float(jnp.mean(acc)):.3f}")

        t, _ = timeit(mincut.mincut_accept, t0, t1, c00, c01, c10)
        print(f"  XLA mincut:    {t*1e3:8.2f} ms")
        for spr in (8, 16, 32):
            t, acc2 = timeit(mincut_pallas.mincut_accept_pallas, t0, t1,
                             c00, c01, c10, sweeps_per_round=spr)
            match = bool(jnp.all(acc2 == acc))
            print(f"  pallas spr={spr:3d}: {t*1e3:8.2f} ms  match={match}")


if __name__ == "__main__":
    main()
