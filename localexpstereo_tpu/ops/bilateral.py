"""Joint bilateral cost aggregation (reference ``BilateralFilter``,
``GuidedFilter.h:329-374``).

The alternative aggregator selected by ``paramsBF`` (``main.cpp:72``): a
naive O(R^2) weighted mean with weights ``exp(-||I(q) - I(p)||_1 / sigma)``
over a (2R+1)^2 window, zero beyond the crop. Not used by the demo paths but
part of the reference's energy API surface.

Implemented as a ``lax.scan`` over window offsets (compile-friendly for the
1681-tap window) with shifted-array arithmetic per tap.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("radius", "sigma"))
def filter_windows(p: jnp.ndarray, guide: jnp.ndarray, mask: jnp.ndarray,
                   radius: int, sigma: float) -> jnp.ndarray:
    """Joint-bilateral filters a batch of cost windows.

    Args:
      p: [N, F, F] raw costs.
      guide: [N, F, F, 3] guide windows (0..255 scale, like the reference
        which passes the raw image to BilateralFilter).
      mask: [N, F, F] in-image indicator.
    Returns:
      [N, F, F] aggregated costs.
    """
    n, f = p.shape[0], p.shape[1]
    k = 2 * radius + 1
    mask = mask.astype(p.dtype)
    p0 = p * mask

    pad = ((0, 0), (radius, radius), (radius, radius))
    p_pad = jnp.pad(p0, pad)
    m_pad = jnp.pad(mask, pad)
    g_pad = jnp.pad(guide, pad + ((0, 0),))

    offsets = jnp.asarray(
        [(dy, dx) for dy in range(k) for dx in range(k)], jnp.int32)

    def tap(carry, off):
        num, den = carry
        dy, dx = off[0], off[1]
        ps = jax.lax.dynamic_slice(p_pad, (0, dy, dx), (n, f, f))
        ms = jax.lax.dynamic_slice(m_pad, (0, dy, dx), (n, f, f))
        gs = jax.lax.dynamic_slice(g_pad, (0, dy, dx, 0), (n, f, f, 3))
        w = jnp.exp(-jnp.sum(jnp.abs(gs - guide), -1) / sigma) * ms
        return (num + w * ps, den + w), None

    (num, den), _ = jax.lax.scan(
        tap, (jnp.zeros_like(p), jnp.zeros_like(p)), offsets)
    return num / jnp.maximum(den, 1e-8)
