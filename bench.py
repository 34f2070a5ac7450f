"""Benchmark: MiddV3 halfH-scale local expansion stereo on real TPU.

Prints ONE JSON line whose primary metric is sec/frame for the reference's
headline workload shape (Adirondack halfH: 1436x992, MC-CNN cost volume)
running the full pipeline — 2 PatchMatch-init sweeps + 5 graph-cut sweeps,
single view, layers {1%, 3%, 9%} of width with the reference proposer sets.

The MC-CNN volume itself is not redistributable (the reference's
``data/MiddV3`` README asks users to download it), so the volume is
synthesized at the exact same shape; the optimizer's work is data-independent
up to min-cut convergence, which the synthetic slanted-plane volume
exercises. ``vs_baseline`` compares against the reference CPU binary's 237 s
end-to-end Adirondack time (``GuidedFilter.h:139-141``; see BASELINE.md).

Extra fields (unless BENCH_FAST=1):
- ``cones_doDual_s`` / ``cones_bad05_nonocc``: REAL-data V2 end-to-end run
  (bundled cones, full 5 GC + 2 PM dual-view schedule incl. postprocess), so
  min-cut convergence counts reflect real image statistics;
- ``batch2_s_per_frame``: amortized throughput of a 2-pair batched run
  (``parallel/batch.py``) at half scale on ONE chip, scaled by
  pixel-disparity volume to halfH-equivalent frames. This is a functional
  demonstration of the vmapped multi-pair path, not the deployment shape:
  interleaving pairs on one chip shares the same compute units.
- ``v5e8_throughput_s_per_frame_est``: the deployment estimate for the
  BASELINE v5e-8 target — 8 chips each solving their own pair
  (communication-free data parallelism over the mesh's ``data`` axis; the
  sharded program itself is validated by ``__graft_entry__.
  dryrun_multichip``), i.e. the measured single-chip latency / 8.
- ``videorate_s_per_frame``: steady-state serving mode (``serving.py``) —
  persistent compiled engine, cell-seeded warm start from the previous
  frame, 1 GC sweep per frame, at the full halfH scale.

Env overrides: BENCH_SCALE (default 1.0) scales H/W/ndisp for quick checks;
BENCH_ITERS / BENCH_PM_ITERS override the sweep counts; BENCH_FAST=1 skips
the extras.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SECONDS = 237.0  # reference filter_raw desktop end-to-end
CONES_DIR = "/root/reference/data/MiddV2/cones"


def build_problem(scale: float, seed: int = 0):
    h = max(int(992 * scale), 64)
    w = max(int(1436 * scale), 96)
    nd = max(int(145 * scale), 16)
    rng = np.random.default_rng(seed)

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


def bench_primary(scale, iters, pm_iters):
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
    return time.perf_counter() - t0


def bench_cones():
    """Real-data V2 run: full reference schedule (5 GC + 2 PM, doDual incl.
    postprocess, the demo.bat cones configuration), optimization-timed."""
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import (
        LocalExpansionSolver, LAYER0_PROPOSERS, COARSE_PROPOSERS)
    from localexpstereo_tpu.ops import plane as plane_ops
    from localexpstereo_tpu.utils import datasets
    import jax
    import jax.numpy as jnp

    pair = datasets.load_data(CONES_DIR, 0)
    params = PARAMS_GF.replace(windR=20, lambda_=1.0)

    def make():
        s = LocalExpansionSolver(pair.im0, pair.im1, params,
                                 pair.max_disparity, seed=0)
        for i, sz in enumerate([5, 15, 25]):
            s.add_layer(sz, LAYER0_PROPOSERS if i == 0
                        else COARSE_PROPOSERS)
        return s

    warm = make()
    warm.run(iterations=5, view_modes=(0, 1), pm_iterations=2)
    solver = make()
    solver.finalize()
    jax.block_until_ready(solver.data)
    t0 = time.perf_counter()
    labeling, _ = solver.run(iterations=5, view_modes=(0, 1),
                             pm_iterations=2)
    elapsed = time.perf_counter() - t0

    disp = np.asarray(plane_ops.disparity_map(jnp.asarray(labeling)))
    prec = pair.calib.gt_prec
    if prec > 0:
        disp = np.rint(disp / prec) * prec
    ok = np.abs(disp - pair.disp_gt) <= 0.5
    bad = 100.0 * (1.0 - (ok & pair.nonocc).sum() / pair.nonocc.sum())
    return elapsed, bad


def bench_batch(scale=0.5, batch=2, iters=5, pm_iters=2):
    """Amortized throughput of a multi-pair batch on ONE chip (a v5e-8 mesh
    runs the same executable with the 'data' axis spread over 8 chips, one
    pair per chip). batch=2 keeps the per-pair slab budget large enough for
    the dense hoist path; larger one-chip batches fall back to chunked
    gathers and measure the fallback, not the deployment shape."""
    import jax
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.parallel import batch as batch_mod
    from localexpstereo_tpu.parallel import mesh as mesh_mod

    probs = [build_problem(scale, seed=i) for i in range(batch)]
    ims = np.stack([p[0] for p in probs])
    vols = np.stack([p[1] for p in probs])
    h, w, nd = probs[0][2], probs[0][3], probs[0][4]
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    mesh = mesh_mod.make_mesh((1,), ("data",), jax.devices()[:1])
    sizes = [max(1, int(w * f)) for f in (0.01, 0.03, 0.09)]

    def make():
        return batch_mod.BatchedSolver(
            ims, ims, params, max_disp=float(nd - 1), mesh=mesh,
            unit_sizes=sizes, vols0=vols, vols1=vols, seed=0,
            vol_dtype="bfloat16")

    warm = make()
    warm.run(iterations=iters, view_modes=(0,), pm_iterations=pm_iters)
    solver = make()
    jax.block_until_ready(solver.data)
    t0 = time.perf_counter()
    solver.run(iterations=iters, view_modes=(0,), pm_iterations=pm_iters)
    elapsed = time.perf_counter() - t0
    # Scale to halfH-equivalent frames by pixel-disparity volume.
    work_ratio = (h * w * nd) / (992 * 1436 * 145)
    return elapsed / batch / work_ratio


def bench_videorate(scale=1.0, frames=4):
    """Steady-state serving mode: persistent compiled engine, cell-seeded
    warm start from the previous frame, 1 GC sweep per frame. Frame 0 (cold
    full schedule + compilation) is excluded; reports the mean of the warm
    frames."""
    import jax.numpy as jnp
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.serving import StereoStream

    img, vol, h, w, nd = build_problem(scale)
    # Volumes arrive on DEVICE in the serving deployment (e.g. produced by
    # the on-device MC-CNN); uploading ~400 MB per frame through the host
    # link is not part of the steady state being measured.
    vol_dev = jnp.asarray(vol)
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    sizes = [max(1, int(w * f)) for f in (0.01, 0.03, 0.09)]
    stream = StereoStream(params, max_disp=float(nd - 1), unit_sizes=sizes,
                          cold_iterations=5, cold_pm_iterations=2,
                          warm_iterations=1)
    stream.process(img, img, vol_dev, vol_dev)   # cold + compile
    stream.process(img, img, vol_dev, vol_dev)   # first warm (compiles warm path)
    times = []
    for _ in range(frames - 1):
        stream.process(img, img, vol_dev, vol_dev)
        times.append(stream.last_frame_seconds)
    return sum(times) / len(times)


def main():
    scale = float(os.environ.get("BENCH_SCALE", "1.0"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    pm_iters = int(os.environ.get("BENCH_PM_ITERS", "2"))
    fast = os.environ.get("BENCH_FAST", "0") == "1"

    elapsed = bench_primary(scale, iters, pm_iters)
    out = {
        "metric": "midv3_halfH_sec_per_frame",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(elapsed / BASELINE_SECONDS, 5),
        "v5e8_throughput_s_per_frame_est": round(elapsed / 8.0, 3),
    }
    if not fast:
        try:
            cones_s, cones_bad = bench_cones()
            out["cones_doDual_s"] = round(cones_s, 3)
            out["cones_bad05_nonocc"] = round(cones_bad, 3)
        except Exception as e:  # extras must never sink the primary metric
            out["cones_error"] = str(e)[:200]
        try:
            out["batch2_s_per_frame"] = round(bench_batch(), 3)
        except Exception as e:
            out["batch_error"] = str(e)[:200]
        try:
            out["videorate_s_per_frame"] = round(bench_videorate(), 3)
        except Exception as e:
            out["videorate_error"] = str(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
