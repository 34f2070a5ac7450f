"""Sub-op breakdown of ONE fine-layer proposal step at HEAD — where do the
~54 ms/color of the dominant greedy phase go?

Times, on realistic engine state at the bench problem's fine layer:
  - proposal generation (expansion / ransac / random),
  - the hoisted slab extraction (per color, amortized over the plan),
  - the tent contraction (``sample_slabs_aligned``) alone,
  - the guided-filter aggregation alone,
  - the dense canvas update alone,
  - the full greedy color step and full GC color step for reference.

Each standalone dispatch carries the ~10 ms tunnel floor; deltas between
legs are the signal (the in-scan engine amortizes the floor).

Usage: python tools/profile_greedy_step.py [scale] [layer_idx]
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
                                              COARSE_PROPOSERS, color_step)
from localexpstereo_tpu.ops import guided, windows
from localexpstereo_tpu.ops import unary_volume


def timeit(label, fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"  {label:42s} {ms:8.2f} ms")
    return ms, out


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    li = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    img, vol, h, w, nd = build_problem(scale)
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    solver = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                                  vol0=vol, vol1=vol, seed=0,
                                  vol_dtype=os.environ.get("PROF_VOL_DTYPE",
                                                           "uint8"))
    solver.add_layer(max(1, int(w * 0.01)), LAYER0_PROPOSERS)
    solver.add_layer(max(1, int(w * 0.03)), COARSE_PROPOSERS)
    solver.add_layer(max(1, int(w * 0.09)), COARSE_PROPOSERS)
    solver.finalize()
    data, cfg = solver.data, solver.cfg

    key = jax.random.PRNGKey(0)
    state = solver._init_state(key, 0)
    state = solver._sweep(state, 0, 0, False, key)
    labeling_m, cost_m = jax.block_until_ready(state)

    layer = solver.layers[li]
    s = layer.unit_size
    ss, t4 = 3 * s, 4 * s
    plan, active, (oxs, oys, rmasks, coxs, coys, dzs, nrs, keys) = \
        solver._layer_inputs(li, layer, 0, key)
    ci = 0
    ox, oy, rmask = oxs[ci], oys[ci], rmasks[ci]
    cox, coy = coxs[ci], coys[ci]
    n_regions = int(ox.shape[0])
    p = cfg.pad
    r = cfg.params.guided_radius
    print(f"layer {li}: s={s} regions/color={n_regions} F={ss + 2 * r} "
          f"D={data.vol.shape[1]} vol_dtype={data.vol.dtype} "
          f"plan={len(plan)} steps")

    # ---- hoists (once per color step) ----
    # NOTE: pass device arrays as ARGUMENTS — a zero-arg closure bakes
    # `data` (volume + stats, 100s of MB at full scale) into the HLO as
    # constants, and the tunneled remote-compile helper rejects the
    # request body with HTTP 413.
    stat_fn = jax.jit(lambda d, ox_, oy_: energy_mod.dense_filter_windows(
        d, cfg, 0, ox_, oy_, coy, cox, s, layer.nby, layer.nbx, -s, ss))
    _, stat_windows = timeit("hoist: GF stat windows", stat_fn, data, ox, oy)
    slab_fn = jax.jit(lambda d: energy_mod.dense_volume_slabs(
        d, cfg, 0, coy, cox, s, layer.nby, layer.nbx, -s, ss))
    t_slab, vol_slabs = timeit("hoist: volume slabs", slab_fn, data)
    gb = vol_slabs.size * vol_slabs.dtype.itemsize / 1e9
    print(f"    (slab array {gb:.2f} GB {vol_slabs.dtype})")

    # ---- proposal generation ----
    cell_fn = jax.jit(lambda lm: windows.dense_windows(
        lm, coy + p + s, cox + p + s, layer.nby, layer.nbx, t4, s))
    _, cell_labels = timeit("proposals: cell windows", cell_fn, labeling_m)
    cw = jnp.clip(cfg.width - ox, 1, s)
    ch = jnp.clip(cfg.height - oy, 1, s)
    _, props = timeit("proposals: expansion", jax.jit(
        lambda cl: proposals.expansion(key, cl, ox, oy, cw, ch)), cell_labels)
    timeit("proposals: ransac", jax.jit(
        lambda cl: proposals.ransac(key, cl, ox, oy, cw, ch)), cell_labels)
    timeit("proposals: random", jax.jit(
        lambda cl: proposals.random_perturbation(
            key, cl, ox, oy, cw, ch, dzs[0], nrs[0], cfg.min_disp,
            cfg.max_disp, cfg.max_vdisp)), cell_labels)

    # ---- unary pieces ----
    fox = ox + (-s - r)
    foy = oy + (-s - r)
    tent_fn = jax.jit(lambda vs, pr: unary_volume.sample_slabs_aligned(
        vs, pr, fox, foy, cfg.height, cfg.width,
        min_disp=cfg.min_disp, th_col=cfg.params.th_col,
        scale=cfg.vol_scale, zero=cfg.vol_zero))
    t_tent, raw = timeit("unary: tent contraction", tent_fn, vol_slabs,
                         props)
    gwin, mwin, iwin, fmask = stat_windows
    t_gf, _ = timeit("unary: guided filter", jax.jit(
        lambda rw, gw, mw, iw, fm: guided.filter_windows(
            rw, gw, mw, iw, fm, r)),
        raw, gwin, mwin, iwin, fmask)
    t_unary, _ = timeit("unary: full (tent+GF+mask)", jax.jit(
        lambda d, sw, vs, pr: energy_mod.unary_windows(
            d, cfg, 0, pr, ox, oy, -s, ss, sw, vs)),
        data, stat_windows, vol_slabs, props)

    # ---- full color steps ----
    def full(do_gc):
        return color_step(data, cfg, labeling_m, cost_m, ox, oy, rmask,
                          cox, coy, dzs, nrs, key, unit_size=s,
                          nbx=layer.nbx, nby=layer.nby, plan=plan,
                          do_gc=do_gc, mode=0, step_active=active)

    t_greedy, _ = timeit(f"FULL greedy color step ({len(plan)} props)",
                         full, False, n=5)
    t_gc, _ = timeit(f"FULL GC color step ({len(plan)} props)", full, True,
                     n=5)
    floor = 10.0  # approximate tunnel dispatch floor to subtract
    per_prop = (t_greedy - floor - t_slab) / len(plan)
    print(f"\n  per-proposal cost in the greedy step ~ {per_prop:.2f} ms "
          f"(vs standalone tent {t_tent - floor:.2f} + GF "
          f"{t_gf - floor:.2f})")


if __name__ == "__main__":
    main()
