"""MC-CNN-style matching-cost network (end-to-end TPU pipeline).

The reference consumes PRE-COMPUTED MC-CNN cost volumes (``im0.acrt``,
``README.md:74-91``) produced offline by the original Torch/CUDA MC-CNN.
This module closes the loop on-device (BASELINE.json config 5): a compact
siamese conv tower (the "fast" MC-CNN architecture: shared 3x3 conv stack +
feature normalization + cosine-similarity matching) computes the
``[D, H, W]`` volume directly from the rectified pair, so the full
volume -> local-expansion pipeline runs without leaving the TPU.

Weights are a plain pytree (save/load via npz); `init_params` gives a random
Glorot init for benchmarking and for training downstream.
"""
from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

#: Feature tower: (out_channels per conv layer); 3x3 kernels, ReLU between.
DEFAULT_CHANNELS = (32, 32, 64, 64)


def init_params(key: jax.Array, channels: Sequence[int] = DEFAULT_CHANNELS,
                in_channels: int = 3) -> Dict:
    params = {}
    c_in = in_channels
    for i, c_out in enumerate(channels):
        key, k = jax.random.split(key)
        scale = jnp.sqrt(2.0 / (9 * c_in))
        params[f"w{i}"] = jax.random.normal(k, (3, 3, c_in, c_out)) * scale
        params[f"b{i}"] = jnp.zeros((c_out,))
        c_in = c_out
    return params


def num_layers(params: Dict) -> int:
    return sum(1 for k in params if k.startswith("w"))


@jax.jit
def features(params: Dict, image: jnp.ndarray) -> jnp.ndarray:
    """[H, W, C] L2-normalized matching features of a [H, W, 3] image
    (0..255; normalized internally)."""
    x = (image - 128.0) / 64.0
    x = x[None]
    n = num_layers(params)
    for i in range(n):
        x = jax.lax.conv_general_dilated(
            x, params[f"w{i}"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + params[f"b{i}"]
        if i < n - 1:
            x = jax.nn.relu(x)
    x = x[0]
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6)


@functools.partial(jax.jit, static_argnames=("ndisp",))
def cost_volume(params: Dict, im0: jnp.ndarray, im1: jnp.ndarray,
                ndisp: int) -> jnp.ndarray:
    """[ndisp, H, W] matching-cost volume: ``1 - <f0(x), f1(x - d)>`` with
    replicate-edge behavior for out-of-view columns (the same convention the
    reference restores with ``fillOutOfView``, ``main.cpp:146-163``).

    The disparity axis is a ``lax.scan``, NOT a vmap: a vmapped shift turns
    into one [ndisp, H, W, C] gather — 106 GB at halfH geometry (the round-4
    bench leg's compile-time OOM). The scan keeps peak residency at one
    [H, W, C] shifted-feature slab per step; each step is a dynamic_slice of
    the edge-padded f1 plus a fused multiply-reduce over C, so the loop is
    HBM-bandwidth-bound, exactly where a correlation with C=64 should sit.
    """
    f0 = features(params, im0)
    f1 = features(params, im1)
    w = f0.shape[1]
    # Left edge-pad by ndisp so f1(x - d) is a static-size dynamic_slice.
    f1_pad = jnp.pad(f1, ((0, 0), (ndisp, 0), (0, 0)), mode="edge")

    def one_disp(_, d):
        f1_shift = jax.lax.dynamic_slice_in_dim(f1_pad, ndisp - d, w, axis=1)
        cost = 1.0 - jnp.sum(f0 * f1_shift, axis=-1)
        # Out-of-view fill: vol[d, y, x] = vol[d, y, d] for x < d
        # (fillOutOfView semantics, main.cpp:152-163).
        cols = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 1)
        first_valid = jax.lax.dynamic_slice_in_dim(
            cost, jnp.clip(d, 0, w - 1), 1, axis=1)
        return None, jnp.where(cols >= d, cost, first_valid)

    _, vol = jax.lax.scan(one_disp, None, jnp.arange(ndisp))
    return vol


def default_weights_path() -> str:
    """Path of the bundled trained weights (``tools/train_mccnn.py``)."""
    import os
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "weights", "mccnn_fast_v2.npz")


def load_default_params() -> Dict:
    """Loads the bundled MC-CNN-fast weights trained on MiddV2 GT
    (cones/teddy/venus; tsukuba holdout matching accuracy 94.6%)."""
    return load_params(default_weights_path())


def save_params(path: str, params: Dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params(path: str) -> Dict:
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}
