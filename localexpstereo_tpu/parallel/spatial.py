"""Spatial (height-axis) sharding with halo exchange.

The scale dimension of this workload is the ``[D, H, W]`` cost volume and the
window aggregation over it (SURVEY.md section 5, "long-context" analog;
BASELINE.json config 4). Images/volumes shard along H across the ``space``
mesh axis; box-filter windows need ``radius`` rows of neighbor context, which
are exchanged with ``ppermute`` (ICI neighbor exchange) inside ``shard_map``
— the TPU-native replacement for what a multi-node CPU port would do with
MPI halos.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import boxfilter


def _exchange_halo(block: jnp.ndarray, radius: int, axis_name: str):
    """Appends ``radius`` rows from each H-neighbor shard (zero at the
    global boundary). block: [Hs, ...]."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    up = [(i, (i + 1) % n) for i in range(n)]      # send to next (down)
    down = [(i, (i - 1) % n) for i in range(n)]    # send to prev (up)

    bottom_rows = block[-radius:]
    top_rows = block[:radius]
    from_above = jax.lax.ppermute(bottom_rows, axis_name, up)
    from_below = jax.lax.ppermute(top_rows, axis_name, down)
    # Zero the wrap-around contributions at the global image border.
    from_above = jnp.where(idx == 0, jnp.zeros_like(from_above), from_above)
    from_below = jnp.where(idx == n - 1, jnp.zeros_like(from_below),
                           from_below)
    return jnp.concatenate([from_above, block, from_below], axis=0)


def sharded_boxsum2d(x: jnp.ndarray, radius: int, mesh: Mesh,
                     axis_name: str = "space") -> jnp.ndarray:
    """Zero-padded box sum of [H, W] (or [C, H, W]) with H sharded.

    Matches :func:`ops.boxfilter.boxsum2d` exactly: each shard extends its
    block with ``radius`` halo rows from its neighbors, runs the banded-
    matmul box sum locally, and keeps its own rows.
    """
    spec = P(*([None] * (x.ndim - 2)), axis_name, None)

    def local(block):
        # block: [..., Hs, W]; move H first for the halo exchange.
        moved = jnp.moveaxis(block, -2, 0)
        ext = _exchange_halo(moved, radius, axis_name)
        ext = jnp.moveaxis(ext, 0, -2)
        out = boxfilter.boxsum2d(ext, radius)
        out = jnp.moveaxis(out, -2, 0)[radius:-radius]
        return jnp.moveaxis(out, 0, -2)

    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(x)


def sharded_cost_aggregation(raw_cost: jnp.ndarray, guide: jnp.ndarray,
                             mean: jnp.ndarray, inv: jnp.ndarray,
                             radius: int, mesh: Mesh,
                             axis_name: str = "space") -> jnp.ndarray:
    """Whole-image guided-filter aggregation with H sharded across devices.

    Full-image analog of :func:`ops.guided.filter_windows` for the
    volume-sharded pipeline (BASELINE.json config 4): every box sum becomes a
    halo-exchanged sharded box sum; all other math is pointwise and stays
    local to each shard.
    """
    spec_hw = P(axis_name, None)
    spec_hwc = P(axis_name, None, None)

    def local(p, g, m, iv):
        hs = p.shape[0]

        def box(v):  # [..., Hs, W] with halo
            moved = jnp.moveaxis(v, -2, 0)
            ext = _exchange_halo(moved, radius, axis_name)
            ext = jnp.moveaxis(ext, 0, -2)
            out = boxfilter.boxsum2d(ext, radius)
            out = jnp.moveaxis(out, -2, 0)[radius:-radius]
            return jnp.moveaxis(out, 0, -2)

        ones = jnp.ones((hs, p.shape[1]), p.dtype)
        n = box(ones)
        inv_n = 1.0 / jnp.maximum(n, 1e-8)
        gi = jnp.moveaxis(g, -1, 0)                       # [3, Hs, W]
        sums = box(jnp.concatenate([p[None], p[None] * gi], axis=0))
        mean_p = sums[0] * inv_n
        cov = sums[1:] * inv_n - jnp.moveaxis(m, -1, 0) * mean_p[None]
        a_r = iv[..., 0] * cov[0] + iv[..., 1] * cov[1] + iv[..., 2] * cov[2]
        a_g = iv[..., 1] * cov[0] + iv[..., 3] * cov[1] + iv[..., 4] * cov[2]
        a_b = iv[..., 2] * cov[0] + iv[..., 4] * cov[1] + iv[..., 5] * cov[2]
        b = mean_p - a_r * m[..., 0] - a_g * m[..., 1] - a_b * m[..., 2]
        ab = box(jnp.stack([a_r, a_g, a_b, b]))
        q = (ab[0] * g[..., 0] + ab[1] * g[..., 1] + ab[2] * g[..., 2]
             + ab[3]) * inv_n
        return q

    fn = shard_map(local, mesh=mesh,
                   in_specs=(spec_hw, spec_hwc, spec_hwc, spec_hwc),
                   out_specs=spec_hw)
    return fn(raw_cost, guide, mean, inv)
