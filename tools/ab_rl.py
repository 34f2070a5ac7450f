"""A/B: region-on-lanes vs region-major unary layout, per (layer, do_gc),
at bench scale on the real device. Times the full layer_sweep dispatch
(16 colors in one scan) — the unit the schedule is built from.

Usage: python tools/ab_rl.py [scale] [layer_idx ...]
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import numpy as np

from bench import build_problem
from localexpstereo_tpu.config import PARAMS_GF
from localexpstereo_tpu.models import engine as engine_mod
from localexpstereo_tpu.models.engine import (LocalExpansionSolver,
                                              LAYER0_PROPOSERS,
                                              COARSE_PROPOSERS, init_step,
                                              layer_sweep)


def timeit(fn, n=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    layers_sel = [int(a) for a in sys.argv[2:]] or [0, 1, 2]
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
    lab, cost = init_step(data, cfg, key,
                          unit_size=solver.layers[0].unit_size, mode=0)
    lab, cost = solver._sweep((lab, cost), 0, 0, False, key)
    jax.block_until_ready(cost)

    for li in layers_sel:
        layer = solver.layers[li]
        plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys) = \
            solver._layer_inputs(li, layer, 0, key)
        for layout in ("rm", "rl"):
            c = dataclasses.replace(cfg, unary_layout=layout)
            for do_gc in (False, True):
                t = timeit(lambda: layer_sweep(
                    data, c, lab, cost, oxs, oys, rmasks, coxs, coys,
                    dzs, nrs, keys, unit_size=layer.unit_size,
                    nbx=layer.nbx, nby=layer.nby, plan=plan, do_gc=do_gc,
                    mode=0, step_active=active))
                print(f"layer {li} (s={layer.unit_size}, "
                      f"N={layer.nbx * layer.nby}, plan={len(plan)}) "
                      f"{layout} gc={int(do_gc)}: {t * 1000:8.2f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
