"""A/B the fused expansion kernel's round structure at the coarse layers.

The fused push-relabel alternates an exact global relabel (BFS to fixpoint —
O(residual distance) sequential relax iterations, the dominant cost at
S = 387) with ``sweeps_per_round`` push sweeps. This tool times
``expansion_accept_pallas`` on REAL engine state (bench problem, one settled
greedy sweep, a live GC proposal) across (max_global_rounds,
sweeps_per_round) and asserts the accept masks stay identical to the default
(the max-flow residual can-reach-sink set is unique across execution
schedules, so any converged run must agree — inequality means a knob broke
convergence).

Usage: python tools/ab_mincut_knobs.py [scale]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem
from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models import energy as energy_mod
from localexpstereo_tpu.models import proposals
from localexpstereo_tpu.models.engine import (LocalExpansionSolver,
                                              LAYER0_PROPOSERS,
                                              COARSE_PROPOSERS)
from localexpstereo_tpu.ops import mincut_pallas


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
    state = solver._init_state(key, 0)
    state = solver._sweep(state, 0, 0, False, key)
    labeling_m, cost_m = state
    jax.block_until_ready(state)
    p = cfg.pad

    only = os.environ.get("AB_LAYERS")  # e.g. "1,2"
    only = {int(x) for x in only.split(",")} if only else None
    grid = os.environ.get("AB_GRID")  # e.g. "64:16,64:64"
    if grid:
        grid = [tuple(int(v) for v in g.split(":")) for g in grid.split(",")]
    else:
        grid = [(64, 16), (64, 8), (64, 32), (64, 64), (64, 128),
                (32, 16), (128, 16)]

    for li, layer in enumerate(solver.layers):
        if only is not None and li not in only:
            continue
        i0, j0 = layer.colors[5 % len(layer.colors)]
        ox_, oy_, _ = layer.color_regions(i0, j0)
        ox, oy = jnp.asarray(ox_), jnp.asarray(oy_)
        s = layer.unit_size
        ss = 3 * s
        n = ox.shape[0]
        cw = jnp.clip(cfg.width - ox, 1, s)
        ch = jnp.clip(cfg.height - oy, 1, s)
        cell_labels = energy_mod.slice_windows(labeling_m, ox, oy, p, 0, s)
        props = proposals.ransac(key, cell_labels, ox, oy, cw, ch)
        pcost = energy_mod.unary_windows(data, cfg, 0, props, ox, oy,
                                         target_off=-s, target_size=ss)
        ccost = energy_mod.slice_windows(cost_m, ox, oy, p, -s, ss)
        coeff_win = energy_mod.slice_windows_leading(
            data.coeff8[0], ox, oy, p, -s, ss)
        halo = energy_mod.slice_windows(labeling_m, ox, oy, p, -s - 1,
                                        ss + 2)
        jax.block_until_ready((props, pcost, ccost, coeff_win, halo))

        print(f"\n== layer {li}: S={ss} regions={n}")
        ref = None
        for mgr, spr in grid:
            fn = lambda: mincut_pallas.expansion_accept_pallas(
                halo, props, (ox - s).astype(jnp.float32),
                (oy - s).astype(jnp.float32), coeff_win, ccost, pcost,
                lam=cfg.params.lambda_, tau=cfg.params.th_smooth,
                max_global_rounds=mgr, sweeps_per_round=spr)
            t, acc = timeit(fn)
            acc = np.asarray(acc)
            if ref is None:
                ref = acc
                agree = "ref"
            else:
                agree = "==" if (acc == ref).all() else \
                    f"DIFF {(acc != ref).sum()}px"
            print(f"  rounds={mgr:4d} sweeps/round={spr:4d}: "
                  f"{t * 1e3:8.2f} ms  accept {agree}")


if __name__ == "__main__":
    main()
