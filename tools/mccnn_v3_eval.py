"""MC-CNN front-half validation at V3 halfH geometry (VERDICT r3 item 4).

The reference consumes OFFLINE Torch/CUDA MC-CNN volumes for MiddV3
(``README.md:74-91``); our on-device MC-CNN (``models/mccnn.py``) was
trained and accuracy-pinned on bundled V2 pairs only (tsukuba holdout).
This tool closes the V3-scale gap without the non-redistributable MiddV3
images: it builds a WARP-CONSISTENT synthetic pair at the exact halfH
geometry (1436 x 992, ndisp 145) —

- right image: band-limited random texture (multi-octave smoothed noise,
  the hard case for a matching net: no semantic cues, pure local texture);
- GT disparity: piecewise slanted planes with occlusion-producing jumps;
- left image: ``imL(x) = imR(x - d_gt(x))`` by bilinear sampling, so the
  photometric correspondence is exact by construction at non-occluded
  pixels —

then scores the MC-CNN volume two ways:

1. WTA (argmin over d) bad-1.0 / bad-2.0 vs GT — the volume's raw quality;
2. end-to-end: the full local-expansion solve on the volume, final bad-1.0
   (images -> volume -> solve all on one device).

Writes ``tools/mccnn_v3_eval.json``; run on the TPU for the timing field
(the accuracy is backend-independent).

Usage: python tools/mccnn_v3_eval.py [--platform cpu] [--scale 1.0]
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


def build_pair(h, w, nd, seed=0):
    import numpy as np
    rng = np.random.default_rng(seed)

    # Multi-octave band-limited texture (values 0..255, 3 channels).
    def texture():
        img = np.zeros((h, w, 3), np.float32)
        for octave in (4, 8, 16, 32, 64):
            n = rng.random((h // octave + 2, w // octave + 2, 3)) - 0.5
            ys = np.linspace(0, n.shape[0] - 1.001, h)
            xs = np.linspace(0, n.shape[1] - 1.001, w)
            y0 = ys.astype(int)[:, None]
            x0 = xs.astype(int)[None, :]
            fy = (ys[:, None] - y0)[..., None]
            fx = (xs[None, :] - x0)[..., None]
            img += ((n[y0, x0] * (1 - fy) + n[y0 + 1, x0] * fy) * (1 - fx)
                    + (n[y0, x0 + 1] * (1 - fy)
                       + n[y0 + 1, x0 + 1] * fy) * fx) * octave
        img -= img.min()
        return (img / img.max() * 255.0).astype(np.float32)

    im_r = texture()

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    d_gt = np.full((h, w), 0.25 * nd, np.float32)
    for _ in range(8):
        cx, cy = rng.uniform(0, w), rng.uniform(0, h)
        a = rng.uniform(-0.08, 0.08)
        b = rng.uniform(-0.08, 0.08)
        c = rng.uniform(0.25, 0.9) * nd
        rad = rng.uniform(0.15, 0.45) ** 2 * (h * w)
        mask = ((xs - cx) ** 2 + (ys - cy) ** 2) < rad
        plane = np.clip(a * (xs - cx) + b * (ys - cy) + c, 1.0, nd - 2.0)
        d_gt = np.where(mask & (plane > d_gt), plane, d_gt)

    # imL(x) = imR(x - d(x)), bilinear in x.
    src = xs - d_gt
    x0 = np.clip(np.floor(src).astype(int), 0, w - 2)
    f = np.clip(src - x0, 0.0, 1.0)[..., None]
    yi = ys.astype(int)
    im_l = im_r[yi, x0] * (1 - f) + im_r[yi, x0 + 1] * f
    valid = src >= 0
    return im_l.astype(np.float32), im_r, d_gt, valid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    ap.add_argument("--scale", type=float, default=1.0)
    ns = ap.parse_args()
    if ns.platform:
        import jax
        jax.config.update("jax_platforms", ns.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from localexpstereo_tpu.models import mccnn

    h = max(int(992 * ns.scale), 64)
    w = max(int(1436 * ns.scale), 96)
    nd = max(int(145 * ns.scale), 16)
    im_l, im_r, d_gt, valid = build_pair(h, w, nd)
    params = mccnn.load_default_params()

    t0 = time.time()
    vol = mccnn.cost_volume(params, jnp.asarray(im_l), jnp.asarray(im_r),
                            ndisp=nd)
    jax.block_until_ready(vol)
    t_compile = time.time() - t0
    t0 = time.time()
    vol = mccnn.cost_volume(params, jnp.asarray(im_l), jnp.asarray(im_r),
                            ndisp=nd)
    wta = jnp.argmin(vol, axis=0).astype(jnp.float32)
    jax.block_until_ready(wta)
    t_warm = time.time() - t0

    wta = np.asarray(wta)
    err = np.abs(wta - d_gt)
    bad1 = 100.0 * ((err > 1.0) & valid).sum() / valid.sum()
    bad2 = 100.0 * ((err > 2.0) & valid).sum() / valid.sum()
    print(f"WTA bad1.0 {bad1:.2f}%  bad2.0 {bad2:.2f}%  "
          f"(volume {t_warm:.2f}s warm, {t_compile:.1f}s cold)", flush=True)

    # End-to-end: volume -> local expansion solve -> final disparity.
    from localexpstereo_tpu.config import PARAMS_GF
    from localexpstereo_tpu.models.engine import (
        LocalExpansionSolver, LAYER0_PROPOSERS, COARSE_PROPOSERS)
    from localexpstereo_tpu.ops import plane as plane_ops

    sp = PARAMS_GF.replace(windR=20, lambda_=0.5, th_col=0.5)
    vol_np = np.asarray(vol)
    solver = LocalExpansionSolver(im_l, im_r, sp, max_disp=float(nd - 1),
                                  vol0=vol_np, vol1=vol_np, seed=0)
    for i, f in enumerate((0.01, 0.03, 0.09)):
        solver.add_layer(max(1, int(w * f)),
                         LAYER0_PROPOSERS if i == 0 else COARSE_PROPOSERS)
    t0 = time.time()
    labeling, _ = solver.run(iterations=5, view_modes=(0,), pm_iterations=2)
    t_solve = time.time() - t0
    disp = np.asarray(plane_ops.disparity_map(jnp.asarray(labeling)))
    err = np.abs(disp - d_gt)
    sbad1 = 100.0 * ((err > 1.0) & valid).sum() / valid.sum()
    sbad2 = 100.0 * ((err > 2.0) & valid).sum() / valid.sum()
    print(f"solve bad1.0 {sbad1:.2f}%  bad2.0 {sbad2:.2f}%  "
          f"({t_solve:.1f}s incl. compile)", flush=True)

    out = {
        "geometry": {"h": h, "w": w, "ndisp": nd, "scale": ns.scale},
        "backend": jax.default_backend(),
        "mccnn_volume_warm_s": round(t_warm, 3),
        "wta_bad1": round(bad1, 3), "wta_bad2": round(bad2, 3),
        "solve_bad1": round(sbad1, 3), "solve_bad2": round(sbad2, 3),
        "solve_s_incl_compile": round(t_solve, 1),
    }
    path = os.path.join(os.path.dirname(__file__), "mccnn_v3_eval.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
