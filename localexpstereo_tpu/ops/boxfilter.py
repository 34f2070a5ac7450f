"""Box-filter sums as banded matmuls (MXU-friendly).

The reference's guided filter is built on unnormalized ``cv::boxFilter`` with
``BORDER_CONSTANT`` (zero) padding plus a true-count normalizer N
(``GuidedFilter.h:40-45,69``). A (2R+1)-tap 1D box sum of a length-n signal is
exactly multiplication by an n x n banded 0/1 matrix; a 2D box sum is
``B_h^T @ X @ B_w``. On TPU this routes the documented hot loop
(``GuidedFilter.h:254``) onto the 128x128 systolic array instead of scalar
window loops, and batches trivially over regions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _band_matrix_np(n: int, radius: int) -> np.ndarray:
    """0/1 matrix with ``M[i, j] = 1 iff |i - j| <= radius`` so that
    ``x @ M`` is the zero-padded box sum along the last axis."""
    idx = np.arange(n)
    return (np.abs(idx[:, None] - idx[None, :]) <= radius).astype(np.float32)


def band_matrix(n: int, radius: int) -> jnp.ndarray:
    return jnp.asarray(_band_matrix_np(n, radius))


def boxsum2d(x: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Unnormalized (2R+1)^2 box sum with zero padding.

    Args:
      x: [..., H, W] float32.
    Returns:
      same shape; ``out[y, x] = sum of x over the window clipped to bounds``.
    """
    h, w = x.shape[-2], x.shape[-1]
    bh = band_matrix(h, radius)
    bw = band_matrix(w, radius)
    # Row direction: sum over y' with |y' - y| <= R  ==  bh^T applied on axis -2.
    # HIGHEST precision: the 0/1 band matrix must act as an exact f32
    # accumulator, not a bf16 MXU pass (box sums feed covariance math).
    out = jnp.einsum("...hw,hk->...kw", x, bh,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("...kw,wj->...kj", out, bw,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out


def boxsum2d_many(xs: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Box sum over a stack of planes [..., C, H, W] (same as boxsum2d;
    provided for call-site clarity when filtering channel stacks)."""
    return boxsum2d(xs, radius)
