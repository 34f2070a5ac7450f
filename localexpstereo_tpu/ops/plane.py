"""Plane-label operations on ``[..., 4]`` float32 arrays.

A label is ``(a, b, c, v)`` with disparity ``d(x, y) = a*x + b*y + c`` in
global pixel coordinates and ``v`` an optional vertical-disparity offset
(reference ``Plane.h:4-58``). Labelings are plain arrays, so every op here is
vmappable/jittable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def create_plane(normal: jnp.ndarray, z: jnp.ndarray, x: jnp.ndarray,
                 y: jnp.ndarray, v: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """Builds plane labels from unit normals and a disparity sample.

    ``a = -nx/nz, b = -ny/nz, c = z - a*x - b*y`` (``Plane.h:14-31``).
    ``normal`` is ``[..., 3]``; returns ``[..., 4]``.
    """
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    a = -nx / nz
    b = -ny / nz
    c = z - a * x - b * y
    v = jnp.broadcast_to(jnp.asarray(v, a.dtype), a.shape)
    return jnp.stack([a, b, c, v], axis=-1)


def get_normal(labels: jnp.ndarray) -> jnp.ndarray:
    """Unit normal of a plane label: ``nz = 1/sqrt(1+a^2+b^2)``,
    ``(nx, ny) = (-a, -b)*nz`` (``Plane.h:42-50``; sqrt in f32 here)."""
    a, b = labels[..., 0], labels[..., 1]
    nz = jax.lax.rsqrt(1.0 + a * a + b * b)
    return jnp.stack([-a * nz, -b * nz, nz], axis=-1)


def disparity_at(labels: jnp.ndarray, x: jnp.ndarray,
                 y: jnp.ndarray) -> jnp.ndarray:
    """``d = a*x + b*y + c``; the 4th channel v is excluded, matching the
    homogeneous coordinate ``(x, y, 1, 0)`` dot product used throughout the
    reference (``StereoEnergy.h:112-116,269-272``)."""
    return labels[..., 0] * x + labels[..., 1] * y + labels[..., 2]


def disparity_map(labeling: jnp.ndarray, x0: int = 0, y0: int = 0) -> jnp.ndarray:
    """Per-pixel disparity of a ``[H, W, 4]`` labeling whose (0,0) pixel sits
    at global coordinate ``(x0, y0)`` (``StereoEnergy.h:269-272``)."""
    h, w = labeling.shape[-3], labeling.shape[-2]
    ys = y0 + jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = x0 + jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return disparity_at(labeling, xs, ys)


def normal_map(labeling: jnp.ndarray) -> jnp.ndarray:
    """Visualization map of plane normals (``StereoEnergy.h:274-289``):
    channels ``(nz, (-b*nz+1)/2, (-a*nz+1)/2)`` — kept identical to the
    reference's BGR debug output."""
    a, b = labeling[..., 0], labeling[..., 1]
    nz = jax.lax.rsqrt(1.0 + a * a + b * b)
    c0 = nz
    c1 = (-b * nz + 1.0) / 2.0
    c2 = (-a * nz + 1.0) / 2.0
    return jnp.stack([c0, c1, c2], axis=-1)


def random_unit_vector(key: jax.Array, angle_range: float = jnp.pi,
                       shape: tuple = ()) -> jnp.ndarray:
    """Random unit vector within ``angle_range`` of the +z axis via polar
    sampling (reference ``Utilities.hpp:254-261``: theta ~ U(0, 2pi),
    z ~ U(cos(angle_range), 1), r = sqrt(1 - z^2))."""
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, shape, minval=0.0, maxval=2.0 * jnp.pi)
    z = jax.random.uniform(k2, shape, minval=jnp.cos(angle_range), maxval=1.0)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta), z], axis=-1)


def random_label(key: jax.Array, x: jnp.ndarray, y: jnp.ndarray,
                 min_disp: float, max_disp: float,
                 max_vdisp: float = 0.0) -> jnp.ndarray:
    """Random label at pixel(s) (x, y): z ~ U(min, max), normal within pi/3 of
    the optical axis (``StereoEnergy.h:120-129``)."""
    kz, kn, kv = jax.random.split(key, 3)
    shape = jnp.shape(x)
    z = jax.random.uniform(kz, shape, minval=min_disp, maxval=max_disp)
    n = random_unit_vector(kn, jnp.pi / 3, shape)
    if max_vdisp != 0.0:
        v = jax.random.uniform(kv, shape, minval=-max_vdisp, maxval=max_vdisp)
    else:
        v = jnp.zeros(shape, jnp.float32)
    return create_plane(n, z, jnp.asarray(x, jnp.float32),
                        jnp.asarray(y, jnp.float32), v)
