"""Command-line driver mirroring the reference CLI (``main.cpp:425-480``).

Flags preserved (``main.cpp:33-50``): ``-mode -targetDir -outputDir -doDual
-iterations -pmIterations -ndisp -smooth_weight -filterRadious -mc_threshold
-threadNum`` (note: the reference's flag is the misspelled ``filterRadious``;
we accept both spellings). Both ``-name value`` (reference style) and
``--name value`` are accepted.

Modes:
  MiddV2: image-based data term, layers {5, 15, 25}px, error threshold 0.5,
          GT precision quantization (``main.cpp:270-329``).
  MiddV3: MC-CNN cost-volume data term from ``im0.acrt``/``im1.acrt``,
          layers {1%, 3%, 9%} of width, error threshold 1.0 (x0.5 Q, x2 F)
          (``main.cpp:331-421``).

Outputs: ``disp0.pfm`` (+ ``disp0raw.pfm`` when -doDual), ``time.txt``,
``debug/`` with per-iteration images and ``log_output.txt``.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
from typing import List, Optional

import numpy as np


def _apply_platform_flag(argv: Optional[List[str]]) -> None:
    """Applies ``-platform cpu|tpu`` BEFORE anything can initialize a JAX
    backend. Must run ahead of the package imports below: even an innocuous
    module-level ``jnp`` constant would initialize the default (axon/TPU)
    backend, and the tunneled device hangs client init when wedged — the
    whole point of the flag is to dodge that."""
    args = list(sys.argv[1:] if argv is None else argv)
    for i, a in enumerate(args):
        if a.lstrip("-") == "platform" and i + 1 < len(args):
            plat = args[i + 1]
            if plat in ("cpu", "tpu"):
                import jax
                jax.config.update("jax_platforms", plat)
            return


_apply_platform_flag(None)

from ..config import PARAMS_GF, Options
from ..models.engine import LAYER0_PROPOSERS, COARSE_PROPOSERS, \
    LocalExpansionSolver
from ..models.evaluator import Evaluator
from ..utils import acrt, datasets, pfm


def normalize_argv(argv: Optional[List[str]]) -> List[str]:
    """Accepts the reference's single-dash long flags by normalizing to --
    (shared by the single-pair and batch CLIs)."""
    argv = list(sys.argv[1:] if argv is None else argv)
    norm = []
    for a in argv:
        if a.startswith("-") and not a.startswith("--") and len(a) > 2 \
                and not a[1].isdigit():
            norm.append("-" + a)
        else:
            norm.append(a)
    return norm


def parse_args(argv: Optional[List[str]] = None) -> Options:
    norm = normalize_argv(argv)

    ap = argparse.ArgumentParser(
        prog="localexpstereo_tpu",
        description="TPU-native Local Expansion Stereo")
    ap.add_argument("--mode", default="", choices=["", "MiddV2", "MiddV3"])
    ap.add_argument("--targetDir", default="")
    ap.add_argument("--outputDir", default="")
    ap.add_argument("--doDual", type=int, default=0)
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--pmIterations", type=int, default=2)
    ap.add_argument("--ndisp", type=int, default=0)
    ap.add_argument("--smooth_weight", type=float, default=None)
    ap.add_argument("--filterRadious", "--filterRadius", type=int,
                    dest="filterRadious", default=20)
    ap.add_argument("--mc_threshold", type=float, default=0.5)
    ap.add_argument("--threadNum", type=int, default=-1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--volume", default="acrt", choices=["acrt", "mccnn"])
    # Cost-volume storage on device. uint8 (default) quantizes to 256
    # levels over [0, 2*mc_threshold] — costs are truncated at tau after
    # interpolation (CostVolumeEnergy.h:98), the decode is exact through
    # the tent contraction, and the measured full-schedule effect on the
    # halfH benchmark is -17% s/frame (slab HBM traffic halves vs bf16);
    # deviation bound tau/255 per sample (tests/test_uint8_volume.py).
    ap.add_argument("--volPrecision", default="uint8",
                    choices=["uint8", "bfloat16", "float32"])
    ap.add_argument("--unaryBackend", default="auto",
                    choices=["auto", "xla", "blk", "dma"])
    # -warmup 1 (default) precompiles the schedule's executables before the
    # evaluator's timer starts, so time.txt is pure optimization time like
    # the reference's TimeStamper (Evaluator.h:113-116); 0 disables.
    ap.add_argument("--warmup", type=int, default=1)
    # N > 1: fuse N-1 extra seeds' solves into the solution (energy-best-
    # of-N via the fusion-move sweep; the reference never wires up its
    # fusionMoveBK hook). Costs N solves on one chip.
    ap.add_argument("--fuseSeeds", type=int, default=0)
    # Backend selection. The environment's tunneled-TPU plugin ignores the
    # JAX_PLATFORMS env var, so "-platform cpu" is the reliable way to run
    # the CLI off-device (fast iteration, or a busy/wedged tunnel).
    ap.add_argument("--platform", default="", choices=["", "cpu", "tpu"])
    # Live progress display: overwrites live_D.png / live_E.png under
    # outputDir/debug each evaluation (the headless equivalent of the
    # reference's cv::imshow windows, Evaluator.h:145-160).
    ap.add_argument("--show", type=int, default=0)
    # Lane-friendly V3 layer sizing (round the width-fraction heuristic
    # down a few px where the 3s move window then fits the f32 VMEM tile;
    # models.grid.lane_friendly_unit). Off by default for exact reference
    # sizing parity.
    ap.add_argument("--laneFriendly", type=int, default=0)
    ns = ap.parse_args(norm)

    return Options(
        mode=ns.mode, output_dir=ns.outputDir, target_dir=ns.targetDir,
        iterations=ns.iterations, pm_iterations=ns.pmIterations,
        do_dual=bool(ns.doDual), ndisp=ns.ndisp,
        smooth_weight=ns.smooth_weight, mc_threshold=ns.mc_threshold,
        filter_radius=ns.filterRadious, thread_num=ns.threadNum,
        seed=ns.seed, volume=ns.volume, warmup=ns.warmup,
        vol_precision=ns.volPrecision, platform=ns.platform,
        fuse_seeds=ns.fuseSeeds, unary_backend=ns.unaryBackend,
        show=bool(ns.show), lane_friendly=bool(ns.laneFriendly))


def print_options(opt: Options):
    print("----------- parameter settings -----------")
    for name, val in [("mode", opt.mode), ("outputDir", opt.output_dir),
                      ("targetDir", opt.target_dir),
                      ("doDual", int(opt.do_dual)),
                      ("pmIterations", opt.pm_iterations),
                      ("iterations", opt.iterations), ("ndisp", opt.ndisp),
                      ("filterRadious", opt.filter_radius),
                      ("smooth_weight", opt.resolve_smooth_weight()),
                      ("mc_threshold", opt.mc_threshold),
                      ("seed", opt.seed), ("volume", opt.volume)]:
        print(f"{name:<15}: {val}")


def _solver_params(opt: Options, have_vols: bool):
    params = PARAMS_GF.replace(
        windR=opt.filter_radius, lambda_=opt.resolve_smooth_weight())
    if have_vols:
        params = params.replace(th_col=opt.mc_threshold)
    return params


def _make_batch_aux(pair, opt: Options, layers, vols=None):
    """Factory for the mesh-parallel -fuseSeeds auxiliary solves: k extra
    seeds as ONE ReplicaSolver batch (one pair per chip; pair b is
    bit-identical to LocalExpansionSolver(seed=first_seed+b)). On a k-chip
    mesh the auxiliary solves cost ~one solve of wall clock."""
    def make(first_seed: int, k: int):
        import jax
        from ..parallel import mesh as mesh_mod
        from ..parallel.replica import ReplicaSolver
        # Only as many devices as auxiliary seeds: ReplicaSolver pads the
        # batch to the mesh size (one redundant build_energy + solve per
        # padded slot), so a k-seed ensemble on an 8-chip mesh must not
        # span all 8 chips.
        devices = jax.devices()[:max(1, min(k, len(jax.devices())))]
        m = mesh_mod.make_mesh((len(devices),), ("data",), devices)
        ims0 = np.repeat(pair.im0[None], k, 0)
        ims1 = np.repeat(pair.im1[None], k, 0)
        kw = {}
        if vols is not None:
            kw["vols0"] = np.repeat(vols[0][None], k, 0)
            kw["vols1"] = np.repeat(vols[1][None], k, 0)
        return ReplicaSolver(
            ims0, ims1, _solver_params(opt, vols is not None),
            pair.max_disparity, mesh=m, unit_sizes=list(layers),
            seed=first_seed, vol_dtype=opt.vol_precision,
            unary_backend=(opt.unary_backend if opt.unary_backend != "auto"
                           else None), **kw)
    return make


def _make_solver(pair: datasets.StereoPair, opt: Options, layers, vols=None):
    params = _solver_params(opt, vols is not None)
    if vols is not None:
        solver = LocalExpansionSolver(
            pair.im0, pair.im1, params, pair.max_disparity,
            vol0=vols[0], vol1=vols[1], seed=opt.seed,
            vol_dtype=opt.vol_precision,
            unary_backend=opt.unary_backend)
    else:
        solver = LocalExpansionSolver(pair.im0, pair.im1, params,
                                      pair.max_disparity, seed=opt.seed)
    solver.add_layer(layers[0], LAYER0_PROPOSERS)
    for sz in layers[1:]:
        solver.add_layer(sz, COARSE_PROPOSERS)
    return solver


def _run(solver: LocalExpansionSolver, pair, opt: Options,
         error_thresh: float, gt_precision: float, make_aux=None,
         make_batch_aux=None):
    out_dir = opt.output_dir or "."
    debug_dir = os.path.join(out_dir, "debug")
    os.makedirs(debug_dir, exist_ok=True)

    ev = Evaluator(pair.disp_gt, pair.nonocc,
                   255.0 / max(pair.max_disparity, 1e-6),
                   header="result", save_dir=debug_dir, show=opt.show)
    ev.set_precision(gt_precision)
    ev.set_error_threshold(error_thresh)

    modes = (0, 1) if opt.do_dual else (0,)
    if opt.warmup:
        solver.precompile(view_modes=modes,
                          pm_iterations=opt.pm_iterations,
                          iterations=opt.iterations)
    # -fuseSeeds N: solve N-1 extra seeds (sharing the primary's compiled
    # executables) BEFORE the evaluator's timer starts; the fusion sweeps
    # themselves run inside the timed solve.
    fuse_with = None
    if opt.fuse_seeds > 1 and (make_aux or make_batch_aux):
        import jax
        fuse_with = []
        k = opt.fuse_seeds - 1
        if len(jax.devices()) > 1 and make_batch_aux is not None:
            # Mesh-parallel auxiliaries: one ReplicaSolver batch, one seed
            # per chip — pair b bit-equals the serial solve with seed+1+b.
            rs = make_batch_aux(opt.seed + 1, k)
            rs.run(opt.iterations, modes, opt.pm_iterations)
            for b in range(k):
                fuse_with.append({m: rs.labeling(b, mode=m)
                                  for m in modes})
            print(f"fuseSeeds: solved {k} auxiliary seed(s) on "
                  f"{len(jax.devices())} devices")
        else:
            for i in range(1, opt.fuse_seeds):
                aux = make_aux(opt.seed + i)
                aux.run(opt.iterations, modes, opt.pm_iterations)
                fuse_with.append({m: np.asarray(
                    aux._unpadded_labeling(aux._state, m)) for m in modes})
                print(f"fuseSeeds: solved auxiliary seed {opt.seed + i}")
        if opt.warmup:
            # Precompile the fusion path as well (fusion_color_step per
            # layer/mode + the warm-start unary chunks) on the throwaway
            # precompile state, keeping time.txt pure optimization time.
            from ..models.engine import init_from_labeling
            for m in modes:
                ext = init_from_labeling(solver.data, solver.cfg,
                                         fuse_with[0][m], m)
                solver._fuse_layers(
                    *ext, m, tuple(reversed(range(len(solver.layers)))))
    solver.set_evaluator(ev)
    labeling, raw = solver.run(opt.iterations, modes, opt.pm_iterations,
                               fuse_with=fuse_with)

    from ..ops import plane as plane_ops
    import jax.numpy as jnp
    disp = np.asarray(plane_ops.disparity_map(jnp.asarray(labeling)))
    pfm.write_pfm(os.path.join(out_dir, "disp0.pfm"), disp)
    if opt.do_dual:
        disp_raw = np.asarray(plane_ops.disparity_map(jnp.asarray(raw)))
        pfm.write_pfm(os.path.join(out_dir, "disp0raw.pfm"), disp_raw)
    with open(os.path.join(out_dir, "time.txt"), "w") as f:
        f.write(f"{ev.get_current_time():f}\n")
    ev.close()
    return disp


def run_midv2(opt: Options):
    """V2 driver (``main.cpp:270-329``)."""
    pair = datasets.load_data(opt.target_dir, opt.ndisp)
    print(f"ndisp = {pair.ndisp}")
    import dataclasses
    solver = _make_solver(pair, opt, layers=[5, 15, 25])
    return _run(solver, pair, opt, error_thresh=0.5,
                gt_precision=pair.calib.gt_prec,
                make_aux=lambda sd: _make_solver(
                    pair, dataclasses.replace(opt, seed=sd),
                    layers=[5, 15, 25]),
                make_batch_aux=_make_batch_aux(pair, opt, [5, 15, 25]))


def load_v3_volumes(target_dir: str, volume: str, pair: datasets.StereoPair):
    """Left/right cost volumes for a V3 dataset: ``im0.acrt``/``im1.acrt``
    (threaded C++ loader with numpy fallback; R recovered from L when absent,
    ``main.cpp:363-367``) or the on-device MC-CNN pipeline."""
    h, w = pair.im0.shape[:2]
    if volume == "mccnn":
        # End-to-end on-device pipeline: images -> MC-CNN features ->
        # cosine cost volumes, replacing the offline Torch/CUDA MC-CNN the
        # reference depends on (``README.md:74-91``).
        import jax.numpy as jnp
        from ..models import mccnn
        mc_params = mccnn.load_default_params()
        print("Computing MC-CNN cost volumes on device.")
        vol_l = np.asarray(mccnn.cost_volume(
            mc_params, jnp.asarray(pair.im0), jnp.asarray(pair.im1),
            pair.ndisp))
        vol_r = acrt.fill_out_of_view(
            acrt.convert_volume_l2r(vol_l), 1)
        return vol_l, vol_r
    p0 = os.path.join(target_dir, "im0.acrt")
    p1 = os.path.join(target_dir, "im1.acrt")
    try:
        # Threaded C++ loader (parallel pread + fused fills); falls back
        # to the numpy codec if the toolchain is unavailable.
        from .. import native
        vol_l = native.read_acrt_fill(p0, pair.ndisp, h, w, fill_mode=0)
        if os.path.exists(p1):
            vol_r = native.read_acrt_fill(p1, pair.ndisp, h, w,
                                          fill_mode=1)
        else:
            print("Cost volume file im1.acrt not found so recovered "
                  "from im0.acrt.")
            vol_r = native.convert_l2r_fill(vol_l)
    except (OSError, subprocess.CalledProcessError):
        vol_l = acrt.read_acrt(p0, pair.ndisp, h, w)
        vol_l = acrt.fill_out_of_view(vol_l, 0)
        if os.path.exists(p1):
            vol_r = acrt.read_acrt(p1, pair.ndisp, h, w)
        else:
            print("Cost volume file im1.acrt not found so recovered "
                  "from im0.acrt.")
            vol_r = acrt.convert_volume_l2r(vol_l)
        vol_r = acrt.fill_out_of_view(vol_r, 1)
    return vol_l, vol_r


def v3_error_threshold(target_dir: str) -> float:
    """1.0, halved for quarter-size datasets, doubled for full-size
    (``main.cpp:342-346``)."""
    err = 1.0
    if "trainingQ" in target_dir or "testQ" in target_dir:
        err /= 2.0
    elif "trainingF" in target_dir or "testF" in target_dir:
        err *= 2.0
    return err


def v3_layers(w: int, lane_friendly: bool = False) -> List[int]:
    """Reference heuristic {1%, 3%, 9%} of width (``main.cpp:395-397``);
    with ``lane_friendly`` each size may shrink a few px to fit the f32
    VMEM tile (:func:`..models.grid.lane_friendly_unit`)."""
    sizes = [max(1, int(w * 0.01)), max(1, int(w * 0.03)),
             max(1, int(w * 0.09))]
    if lane_friendly:
        from ..models.grid import lane_friendly_unit
        sizes = [lane_friendly_unit(s) for s in sizes]
    return sizes


def run_midv3(opt: Options):
    """V3 driver (``main.cpp:331-421``)."""
    pair = datasets.load_data(opt.target_dir, opt.ndisp)
    print(f"ndisp = {pair.ndisp}")
    h, w = pair.im0.shape[:2]
    vol_l, vol_r = load_v3_volumes(opt.target_dir, opt.volume, pair)
    err = v3_error_threshold(opt.target_dir)
    layers = v3_layers(w, opt.lane_friendly)
    import dataclasses
    solver = _make_solver(pair, opt, layers=layers, vols=(vol_l, vol_r))
    return _run(solver, pair, opt, error_thresh=err, gt_precision=-1.0,
                make_aux=lambda sd: _make_solver(
                    pair, dataclasses.replace(opt, seed=sd), layers=layers,
                    vols=(vol_l, vol_r)),
                make_batch_aux=_make_batch_aux(pair, opt, layers,
                                               vols=(vol_l, vol_r)))


def main(argv: Optional[List[str]] = None) -> int:
    opt = parse_args(argv)
    if opt.platform:
        import jax
        jax.config.update("jax_platforms", opt.platform)
    print_options(opt)
    if opt.output_dir:
        os.makedirs(opt.output_dir, exist_ok=True)
    if opt.mode == "MiddV2":
        print("Running by Middlebury V2 mode.")
        run_midv2(opt)
    elif opt.mode == "MiddV3":
        print("Running by Middlebury V3 mode.")
        run_midv3(opt)
    else:
        print("Specify the following arguments:")
        print("  -mode [MiddV2, MiddV3]")
        print("  -targetDir [PATH_TO_IMAGE_DIR]")
        print("  -outputDir [PATH_TO_OUTPUT_DIR]")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
