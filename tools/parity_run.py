"""Accuracy-parity pinning: full reference schedule on the bundled MiddV2 data.

Runs the CLI drivers exactly as ``demo.bat`` does (5 GC + 2 PM sweeps; cones
with ``-doDual`` like the reference demo, the others single-view), then
records per-dataset final energy and bad-pixel rates at thresholds
{0.5, 1.0, 2.0} (all / nonocc, with the reference's V2 GT quantization,
``Evaluator.h:106-111``) into ``PARITY_r2.json``.

These numbers are the regression oracle for every future perf change: the
slow-marked test ``tests/test_parity.py`` re-runs a reduced schedule and
asserts the pinned rates within tolerance.

Usage: python tools/parity_run.py [--out PARITY_r3.json] [--datasets a,b,...]

``--check PINS.json`` re-runs the schedule and asserts every bad rate is
within ``--tol`` (default 0.3 absolute %) of the committed pin and the final
energy within 0.5% relative — the tight regression gate VERDICT round-2
item 4 asked for. Exit code 1 on any violation. Run it on the same backend
the pins were generated on (accept decisions are float-rounding-sensitive
across backends; same backend + same seed is deterministic).

``--doDual-all`` runs every dataset with post-processing. The published
paper-era V2 numbers (venus ~0.1-0.2% bad1.0) are POST-PROCESSED results;
the round-2 pins ran teddy/tsukuba/venus single-view per demo.bat, which is
the main reconciliation between the two (see PARITY.md).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA = "/root/reference/data/MiddV2"
DATASETS = {
    # name: (doDual,) — demo.bat runs cones with -doDual 1 (demo.bat:8).
    "cones": True,
    "teddy": False,
    "tsukuba": False,
    "venus": False,
}


def bad_rates(disp, gt, nonocc, prec):
    """bad-pixel % at thresholds 0.5/1.0/2.0 with V2 GT quantization."""
    if prec > 0:
        disp = np.rint(disp / prec) * prec
    valid = (gt > 0) & np.isfinite(gt)
    out = {}
    err = np.abs(disp - gt)
    for t in (0.5, 1.0, 2.0):
        ok = err <= t
        out[f"bad{t}_all"] = round(
            100.0 * (1.0 - (ok & valid).sum() / max(valid.sum(), 1)), 3)
        out[f"bad{t}_nonocc"] = round(
            100.0 * (1.0 - (ok & nonocc).sum() / max(nonocc.sum(), 1)), 3)
    return out


def run_one(name, do_dual, iterations, pm_iterations, seed, out_root):
    from localexpstereo_tpu.cli import main as cli
    from localexpstereo_tpu.utils import datasets, pfm

    target = os.path.join(DATA, name)
    out_dir = os.path.join(out_root, name)
    os.makedirs(out_dir, exist_ok=True)
    argv = ["-mode", "MiddV2", "-targetDir", target, "-outputDir", out_dir,
            "-doDual", str(int(do_dual)), "-iterations", str(iterations),
            "-pmIterations", str(pm_iterations), "-seed", str(seed)]
    t0 = time.perf_counter()
    rc = cli.main(argv)
    wall = time.perf_counter() - t0
    assert rc == 0

    pair = datasets.load_data(target, 0)
    disp = pfm.read_pfm(os.path.join(out_dir, "disp0.pfm"))
    rates = bad_rates(disp, pair.disp_gt, pair.nonocc, pair.calib.gt_prec)

    # Final log row: Time Eng Data Smooth all nonocc (left view).
    with open(os.path.join(out_dir, "debug", "log_output.txt")) as f:
        rows = [ln.split("\t") for ln in f.read().strip().splitlines()[1:]]
    final = rows[-1]
    with open(os.path.join(out_dir, "time.txt")) as f:
        opt_time = float(f.read().strip())

    rec = {
        "dataset": name, "doDual": do_dual,
        "iterations": iterations, "pmIterations": pm_iterations,
        "seed": seed,
        "energy": float(final[1]), "data_energy": float(final[2]),
        "smooth_energy": float(final[3]),
        "optimization_time_s": round(opt_time, 2),
        "wall_time_s": round(wall, 2),
        **rates,
    }
    if do_dual:
        raw = pfm.read_pfm(os.path.join(out_dir, "disp0raw.pfm"))
        rec["raw"] = bad_rates(raw, pair.disp_gt, pair.nonocc,
                               pair.calib.gt_prec)
    return rec


def check_against(pins_path, results, tol, energy_rtol=0.005):
    """Compare a fresh run against committed pins; returns violations."""
    with open(pins_path) as f:
        pins = json.load(f)["datasets"]
    bad = []
    for name, rec in results["datasets"].items():
        if name not in pins:
            bad.append(f"{name}: no committed pin")
            continue
        pin = pins[name]
        for k, v in pin.items():
            if k.startswith("bad") and isinstance(v, float):
                delta = abs(rec[k] - v)
                if delta > tol:
                    bad.append(f"{name}.{k}: {rec[k]} vs pin {v} "
                               f"(|d|={delta:.3f} > {tol})")
        if abs(rec["energy"] - pin["energy"]) > energy_rtol * pin["energy"]:
            bad.append(f"{name}.energy: {rec['energy']} vs pin "
                       f"{pin['energy']} (> {energy_rtol:.1%} rel)")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="PARITY_r3.json")
    ap.add_argument("--datasets", default=",".join(DATASETS))
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--pmIterations", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tmp", default="/tmp/parity_runs")
    ap.add_argument("--check", default=None, metavar="PINS.json",
                    help="compare against committed pins instead of writing")
    ap.add_argument("--tol", type=float, default=0.3,
                    help="max |delta| on each bad rate (absolute %%)")
    ap.add_argument("--doDual-all", action="store_true",
                    help="post-process every dataset (paper-comparison mode)")
    args = ap.parse_args()

    import jax
    results = {
        "schedule": f"{args.pmIterations} pm + {args.iterations} gc sweeps "
                    "(reference demo.bat defaults)",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "seed": args.seed,
        "datasets": {},
    }
    for name in args.datasets.split(","):
        print(f"=== {name} ===", flush=True)
        do_dual = True if args.doDual_all else DATASETS.get(name, False)
        rec = run_one(name, do_dual, args.iterations,
                      args.pmIterations, args.seed, args.tmp)
        results["datasets"][name] = rec
        print(json.dumps(rec, indent=1), flush=True)

    if args.check:
        bad = check_against(args.check, results, args.tol)
        if bad:
            print("PARITY CHECK FAILED:")
            for b in bad:
                print("  " + b)
            sys.exit(1)
        print(f"parity check OK vs {args.check} (tol {args.tol})")
        return

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
