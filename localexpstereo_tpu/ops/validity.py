"""Label validity: rejects extreme planes (reference ``StereoEnergy.h:560-610``).

A plane is valid at pixel (x, y) iff its disparity is inside
``[MIN, MAX]`` at the pixel itself and at the four probes ``(+-5, +-5)`` in x
and y (evaluated as ``d +- 5a +- 5b``). Pixels where the label is invalid get
unary cost ``COST_FOR_INVALID`` (``StereoEnergy.h:45``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("size", "min_disp", "max_disp"))
def valid_windows(proposals: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                  size: int, min_disp: float, max_disp: float) -> jnp.ndarray:
    """[N, S, S] bool validity of each proposal over its window."""
    iy = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
    ix = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)
    ys = oy[:, None, None].astype(jnp.float32) + iy[None]
    xs = ox[:, None, None].astype(jnp.float32) + ix[None]
    a = proposals[:, 0][:, None, None]
    b = proposals[:, 1][:, None, None]
    c = proposals[:, 2][:, None, None]
    ds = a * xs + b * ys + c
    a5 = a * 5.0
    b5 = b * 5.0
    ok = (ds >= min_disp) & (ds <= max_disp)
    for sa in (+1.0, -1.0):
        for sb in (+1.0, -1.0):
            probe = ds + sa * a5 + sb * b5
            ok &= (probe >= min_disp) & (probe <= max_disp)
    return ok
