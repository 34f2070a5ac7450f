"""Multi-pair batch driver: BASELINE config 3 (trainingH 15-pair batch).

The reference processes one pair per process and runs datasets serially
(``demo.bat:8-10``); this driver spreads a set of datasets over the TPU
mesh, one pair per chip (``parallel/replica.py`` — each device executes the
UNCHANGED single-pair program; batches beyond the mesh run in waves, e.g.
15 trainingH pairs on a v5e-8 = 8 + 7).

Datasets are grouped by compiled shape (H, W, ndisp) — every pair in a
group shares one executable set; each group runs as one ReplicaSolver
batch. Mixed-size sets (Middlebury trainingH images differ per scene)
therefore still batch wherever shapes coincide and degrade to per-pair
runs (batch=1) otherwise, with an explicit log of the grouping.

Per-dataset outputs mirror the single-pair CLI (``disp0.pfm``,
``disp0raw.pfm`` with -doDual, ``time.txt``, ``debug/``); pair ``b`` of a
group follows the RNG stream of ``LocalExpansionSolver(seed + b)`` (the
reference's per-thread seeding analog, ``main.cpp:444-450``). A
``batch_summary.json`` in the output root records group shapes, wall
times, and the amortized s/frame.

Usage:
  python -m localexpstereo_tpu.cli.batch -mode MiddV3 \
      -targetDirs data/trainingH/Adirondack data/trainingH/ArtL ... \
      -outputDir out/ [-doDual 1 -iterations 5 -pmIterations 2 ...]

``-targetParent DIR`` expands to every subdirectory of DIR containing an
``im0.png``/``imL.png`` (the trainingH layout) as if passed to
``-targetDirs``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import List, Optional

import numpy as np

# Importing .main FIRST applies the -platform flag at its module scope
# (it runs _apply_platform_flag(None) on import, reading the same
# sys.argv) — before any other package import can initialize a backend.
from . import main as cli_main
from ..config import PARAMS_GF, Options
from ..models.evaluator import Evaluator
from ..utils import datasets


def parse_args(argv: Optional[List[str]] = None):
    norm = cli_main.normalize_argv(argv)
    ap = argparse.ArgumentParser(
        prog="localexpstereo_tpu-batch",
        description="TPU-native Local Expansion Stereo — multi-pair batch "
                    "driver (one pair per chip over the device mesh)")
    ap.add_argument("--mode", default="MiddV3", choices=["MiddV2", "MiddV3"])
    ap.add_argument("--targetDirs", nargs="+", default=[])
    ap.add_argument("--targetParent", default="")
    ap.add_argument("--outputDir", default="out")
    ap.add_argument("--doDual", type=int, default=0)
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--pmIterations", type=int, default=2)
    ap.add_argument("--ndisp", type=int, default=0)
    ap.add_argument("--smooth_weight", type=float, default=None)
    ap.add_argument("--filterRadious", "--filterRadius", type=int,
                    dest="filterRadious", default=20)
    ap.add_argument("--mc_threshold", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--volume", default="acrt", choices=["acrt", "mccnn"])
    ap.add_argument("--volPrecision", default="uint8",
                    choices=["uint8", "bfloat16", "float32"])
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--platform", default="", choices=["", "cpu", "tpu"])
    return ap.parse_args(norm)


def _dedupe_names(entries: List[dict]) -> None:
    """Disambiguates duplicate leaf names (e.g. trainingH/X and
    trainingQ/X) in place so per-dataset outputs never overwrite each
    other: first by prefixing the parent directory, then by an index."""
    leaf_counts: dict = {}
    for e in entries:
        leaf_counts[e["name"]] = leaf_counts.get(e["name"], 0) + 1
    for e in entries:
        if leaf_counts[e["name"]] > 1:
            parent = os.path.basename(os.path.dirname(e["dir"].rstrip("/")))
            if parent:
                e["name"] = f"{parent}_{e['name']}"
    seen: dict = {}
    for e in entries:
        n = seen.get(e["name"], 0)
        seen[e["name"]] = n + 1
        if n:
            e["name"] = f"{e['name']}_{n}"


def _expand_parent(parent: str) -> List[str]:
    out = []
    for name in sorted(os.listdir(parent)):
        d = os.path.join(parent, name)
        if os.path.isdir(d) and any(
                os.path.exists(os.path.join(d, f))
                for f in ("im0.png", "imL.png")):
            out.append(d)
    return out


def _options_for(ns, target_dir: str) -> Options:
    return Options(
        mode=ns.mode, output_dir="", target_dir=target_dir,
        iterations=ns.iterations, pm_iterations=ns.pmIterations,
        do_dual=bool(ns.doDual), ndisp=ns.ndisp,
        smooth_weight=ns.smooth_weight, mc_threshold=ns.mc_threshold,
        filter_radius=ns.filterRadious, seed=ns.seed, volume=ns.volume,
        warmup=ns.warmup, vol_precision=ns.volPrecision,
        platform=ns.platform)


def run_batch(ns) -> dict:
    import jax
    from ..parallel import mesh as mesh_mod
    from ..parallel.replica import ReplicaSolver

    dirs = list(ns.targetDirs)
    if ns.targetParent:
        dirs += _expand_parent(ns.targetParent)
    if not dirs:
        raise SystemExit("no target directories (use -targetDirs/-targetParent)")

    # Load every dataset and group by compiled shape.
    entries = []
    for d in dirs:
        pair = datasets.load_data(d, ns.ndisp)
        h, w = pair.im0.shape[:2]
        entries.append({"dir": d, "name": os.path.basename(d.rstrip("/")),
                        "pair": pair, "shape": (h, w, pair.ndisp)})
    _dedupe_names(entries)
    groups: dict = {}
    for e in entries:
        groups.setdefault(e["shape"], []).append(e)
    print(f"{len(entries)} datasets in {len(groups)} shape group(s):")
    for shape, es in groups.items():
        print(f"  (H={shape[0]}, W={shape[1]}, ndisp={shape[2]}): "
              + ", ".join(x["name"] for x in es))

    devices = jax.devices()
    mesh = mesh_mod.make_mesh((len(devices),), ("data",), devices)
    modes = (0, 1) if ns.doDual else (0,)
    summary = {"groups": [], "n_devices": len(devices)}

    for shape, es in groups.items():
        h, w, ndisp = shape
        opt0 = _options_for(ns, es[0]["dir"])
        params = PARAMS_GF.replace(windR=ns.filterRadious,
                                   lambda_=opt0.resolve_smooth_weight())
        ims0 = np.stack([e["pair"].im0 for e in es])
        ims1 = np.stack([e["pair"].im1 for e in es])
        if ns.mode == "MiddV3":
            params = params.replace(th_col=ns.mc_threshold)
            vols = [cli_main.load_v3_volumes(e["dir"], ns.volume, e["pair"])
                    for e in es]
            vols0 = np.stack([v[0] for v in vols])
            vols1 = np.stack([v[1] for v in vols])
            layers = cli_main.v3_layers(w, opt0.lane_friendly)
        else:
            vols0 = vols1 = None
            layers = [5, 15, 25]
        max_disp = float(es[0]["pair"].max_disparity)

        solver = ReplicaSolver(ims0, ims1, params, max_disp, mesh=mesh,
                               unit_sizes=layers, vols0=vols0, vols1=vols1,
                               seed=ns.seed, vol_dtype=ns.volPrecision)
        evs = []
        for e in es:
            out_dir = os.path.join(ns.outputDir, e["name"])
            debug_dir = os.path.join(out_dir, "debug")
            os.makedirs(debug_dir, exist_ok=True)
            ev = Evaluator(e["pair"].disp_gt, e["pair"].nonocc,
                           255.0 / max(max_disp, 1e-6), header="result",
                           save_dir=debug_dir)
            if ns.mode == "MiddV2":
                ev.set_precision(e["pair"].calib.gt_prec)
                ev.set_error_threshold(0.5)
            else:
                ev.set_precision(-1.0)
                ev.set_error_threshold(
                    cli_main.v3_error_threshold(e["dir"]))
            evs.append(ev)
        if ns.warmup:
            solver.precompile(view_modes=modes,
                              pm_iterations=ns.pmIterations,
                              iterations=ns.iterations)
        solver.set_evaluators(evs)
        import jax
        # The group wall is optimization time to DEVICE completion (the
        # reference's time.txt contract, Evaluator.h:113-116); the batch
        # labeling download + PFM writes happen off the clock — over the
        # tunneled dev link the D2H alone is ~0.6 s/pair of pure transfer
        # (tools/profile_replica.json), ~ms on any real deployment's PCIe.
        t0 = time.perf_counter()
        final, raw = solver.run(ns.iterations, modes, ns.pmIterations,
                                host_outputs=False)
        jax.block_until_ready(final)
        wall = time.perf_counter() - t0
        final = np.asarray(final)
        raw = np.asarray(raw) if ns.doDual else final

        from ..ops import plane as plane_ops
        import jax.numpy as jnp
        for b, e in enumerate(es):
            out_dir = os.path.join(ns.outputDir, e["name"])
            disp = np.asarray(plane_ops.disparity_map(jnp.asarray(final[b])))
            cli_main.pfm.write_pfm(os.path.join(out_dir, "disp0.pfm"), disp)
            if ns.doDual:
                draw = np.asarray(
                    plane_ops.disparity_map(jnp.asarray(raw[b])))
                cli_main.pfm.write_pfm(
                    os.path.join(out_dir, "disp0raw.pfm"), draw)
            with open(os.path.join(out_dir, "time.txt"), "w") as f:
                f.write(f"{evs[b].get_current_time():f}\n")
            evs[b].close()
        waves = -(-len(es) // len(devices))
        summary["groups"].append({
            "shape": list(shape), "datasets": [e["name"] for e in es],
            "batch": len(es), "waves": waves, "wall_s": round(wall, 3),
            "amortized_s_per_frame": round(wall / len(es), 3)})
        print(f"group {shape}: {len(es)} pairs, {waves} wave(s), "
              f"{wall:.1f} s wall, {wall / len(es):.2f} s/frame amortized")

    os.makedirs(ns.outputDir, exist_ok=True)
    with open(os.path.join(ns.outputDir, "batch_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def main(argv: Optional[List[str]] = None) -> int:
    ns = parse_args(argv)
    if ns.platform:
        import jax
        jax.config.update("jax_platforms", ns.platform)
    os.makedirs(ns.outputDir, exist_ok=True)
    run_batch(ns)
    return 0


if __name__ == "__main__":
    sys.exit(main())
