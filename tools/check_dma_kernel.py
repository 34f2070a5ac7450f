"""Real-TPU validation of the fused DMA unary kernel.

The CI suite runs on a CPU mesh (interpret mode); this tool compiles
``ops/unary_pallas.sample_windows_dma`` on the actual TPU and checks it
bit-for-bit against interpret mode on randomized windows honoring the
padding contract (negative image-coord origins, aligned volume).

Usage: python tools/check_dma_kernel.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from localexpstereo_tpu.ops import unary_pallas


def check(dtype):
    rng = np.random.default_rng(0)
    D, H, W = 24, 64, 200
    pad = 16
    hv0, wv0 = H + 2 * pad, W + 2 * pad
    hv = (hv0 + 7) // 8 * 8 + 8
    wv = (wv0 + 127) // 128 * 128 + 128
    vol = np.zeros((D, hv, wv), np.float32)
    vol[:, pad:pad + H, pad:pad + W] = rng.random((D, H, W),
                                                  ).astype(np.float32)
    N, f = 13, 30
    fox = rng.integers(-pad, W - 5, N).astype(np.int32)
    foy = rng.integers(-pad, H - 5, N).astype(np.int32)
    props = np.stack([rng.uniform(-0.2, 0.2, N),
                      rng.uniform(-0.2, 0.2, N),
                      rng.uniform(0, D - 1, N),
                      np.zeros(N)], -1).astype(np.float32)
    args = (jnp.asarray(vol, dtype), jnp.asarray(props), jnp.asarray(fox),
            jnp.asarray(foy), pad, pad)
    kw = dict(f=f, height=H, width=W, min_disp=0.0, th_col=0.5)
    out = unary_pallas.sample_windows_dma(*args, **kw)
    ref = unary_pallas.sample_windows_dma(*args, **kw, interpret=True)
    diff = float(jnp.abs(out - ref).max())
    print(f"{jnp.dtype(dtype).name}: max |tpu - interpret| = {diff}")
    assert diff == 0.0, f"DMA kernel mismatch on real TPU ({dtype})"


def check_fused_gf():
    """Fused in-kernel guided filter: hardware vs interpret mode."""
    rng = np.random.default_rng(1)
    D, H, W = 16, 56, 180
    pad, f, r, N = 16, 26, 4, 11
    hv0, wv0 = H + 2 * pad, W + 2 * pad
    hv = (hv0 + 7) // 8 * 8 + 8
    wv = (wv0 + 127) // 128 * 128 + 128
    vol = np.zeros((D, hv, wv), np.float32)
    vol[:, pad:pad + H, pad:pad + W] = rng.random((D, H, W),
                                                  ).astype(np.float32)
    stats = np.zeros((12, hv, wv), np.float32)
    stats[:, pad:pad + H, pad:pad + W] = rng.random((12, H, W),
                                                    ).astype(np.float32)
    fox = rng.integers(-pad, W - 5, N).astype(np.int32)
    foy = rng.integers(-pad, H - 5, N).astype(np.int32)
    props = np.stack([rng.uniform(-0.2, 0.2, N),
                      rng.uniform(-0.2, 0.2, N),
                      rng.uniform(0, D - 1, N),
                      np.zeros(N)], -1).astype(np.float32)
    args = (jnp.asarray(vol, jnp.bfloat16), jnp.asarray(props),
            jnp.asarray(fox), jnp.asarray(foy), pad, pad)
    kw = dict(f=f, height=H, width=W, min_disp=0.0, th_col=0.5,
              stats=jnp.asarray(stats), r_gf=r)
    out = unary_pallas.sample_windows_dma(*args, **kw)
    ref = unary_pallas.sample_windows_dma(*args, **kw, interpret=True)
    diff = float(jnp.abs(out - ref).max())
    print(f"fused-gf: max |tpu - interpret| = {diff}")
    assert diff < 1e-3, "fused GF kernel mismatch on real TPU"


def main():
    assert jax.default_backend() == "tpu", "needs the real TPU"
    check(jnp.float32)
    check(jnp.bfloat16)
    check_uint8()         # the engine's default volume storage dtype
    check_fused_gf()
    print("OK")





def check_uint8():
    """uint8-quantized volume (the engine's default storage): hardware vs
    interpret mode, incl. the (32, 128)-tiling alignment path."""
    rng = np.random.default_rng(2)
    D, H, W = 24, 64, 200
    pad, N, f, tau = 16, 13, 30, 0.5
    scale = 2.0 * tau / 255.0
    hv0, wv0 = H + 2 * pad, W + 2 * pad
    hv = (hv0 + 31) // 32 * 32 + 32
    wv = (wv0 + 127) // 128 * 128 + 128
    vol = np.zeros((D, hv, wv), np.uint8)
    vol[:, pad:pad + H, pad:pad + W] = np.clip(
        np.rint(rng.random((D, H, W)) / scale), 0, 255).astype(np.uint8)
    fox = rng.integers(-pad, W - 5, N).astype(np.int32)
    foy = rng.integers(-pad, H - 5, N).astype(np.int32)
    props = np.stack([rng.uniform(-0.2, 0.2, N),
                      rng.uniform(-0.2, 0.2, N),
                      rng.uniform(0, D - 1, N),
                      np.zeros(N)], -1).astype(np.float32)
    args = (jnp.asarray(vol), jnp.asarray(props), jnp.asarray(fox),
            jnp.asarray(foy), pad, pad)
    kw = dict(f=f, height=H, width=W, min_disp=0.0, th_col=tau,
              scale=scale, zero=0.0)
    out = unary_pallas.sample_windows_dma(*args, **kw)
    ref = unary_pallas.sample_windows_dma(*args, **kw, interpret=True)
    diff = float(jnp.abs(out - ref).max())
    print(f"uint8: max |tpu - interpret| = {diff}")
    assert diff == 0.0, "uint8 DMA kernel mismatch on real TPU"


if __name__ == "__main__":
    main()
