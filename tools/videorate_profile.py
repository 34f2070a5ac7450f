"""Serving-mode per-frame breakdown + pipelined steady state (VERDICT r4 #7).

Runs ``serving.StereoStream`` at the full halfH bench geometry on the real
TPU and records, to ``tools/videorate_profile.json``:

1. the per-stage walls of a warm frame with ``profile=True`` — energy
   build (GF stats / pairwise coeffs / uint8 volume quantize, one jitted
   program), the solve (1 warm GC sweep), and the output D2H — explaining
   the residual non-solve overhead the round-4 bench left unattributed;
2. the synchronous steady-state s/frame (``profile=False``, no stage
   syncs — XLA async dispatch already overlaps build with the previous
   frame's tail);
3. the PIPELINED steady-state s/frame (``pipelined=True``): the disparity
   D2H of frame i overlaps frame i+1's build + solve, so the output stage
   leaves the per-frame wall entirely (one frame of latency).

The volume is handed over as a device array (an on-device MC-CNN product
in the deployment; uploading ~400 MB/frame through the tunneled host link
is not the steady state being measured).

Usage: python tools/videorate_profile.py [--scale 1.0] [--frames 6]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--platform", default="")
    ns = ap.parse_args()
    if ns.platform:
        import jax
        jax.config.update("jax_platforms", ns.platform)
    import jax
    import jax.numpy as jnp

    from bench import build_problem, _layer_sizes
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.serving import StereoStream

    img, vol, h, w, nd = build_problem(ns.scale)
    vol_dev = jnp.asarray(vol)
    params = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    sizes = _layer_sizes(w)
    out = {"geometry": {"h": h, "w": w, "ndisp": nd, "scale": ns.scale},
           "backend": jax.default_backend(), "layer_sizes": sizes}

    def run_stream(profile, pipelined):
        stream = StereoStream(params, max_disp=float(nd - 1),
                              unit_sizes=sizes, cold_iterations=5,
                              cold_pm_iterations=2, warm_iterations=1,
                              profile=profile, pipelined=pipelined)
        t0 = time.time()
        stream.process(img, img, vol_dev, vol_dev)      # cold + compile
        cold = time.time() - t0
        stream.process(img, img, vol_dev, vol_dev)      # warm-path compile
        times = []
        for _ in range(ns.frames - 1):
            stream.process(img, img, vol_dev, vol_dev)
            times.append(stream.last_frame_seconds)
        if pipelined:
            stream.flush()
        return cold, times, stream.last_timings

    # 1. Per-stage breakdown (syncs serialize stages; wall > production).
    cold, times, timings = run_stream(profile=True, pipelined=False)
    out["cold_frame_s"] = round(cold, 2)
    out["profiled_warm_s_per_frame"] = round(sum(times) / len(times), 3)
    out["breakdown_last_warm_frame"] = timings
    print(f"profiled warm: {out['profiled_warm_s_per_frame']} s/frame, "
          f"breakdown {timings}", flush=True)

    # 2. Synchronous steady state (the round-4 videorate leg's semantics).
    _, times, _ = run_stream(profile=False, pipelined=False)
    out["sync_s_per_frame"] = round(sum(times) / len(times), 3)
    print(f"sync steady state: {out['sync_s_per_frame']} s/frame", flush=True)

    # 3. Pipelined steady state (D2H off the critical path).
    _, times, _ = run_stream(profile=False, pipelined=True)
    out["pipelined_s_per_frame"] = round(sum(times) / len(times), 3)
    print(f"pipelined steady state: {out['pipelined_s_per_frame']} s/frame",
          flush=True)

    path = os.path.join(os.path.dirname(__file__), "videorate_profile.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
