"""Device-mesh helpers.

The reference is single-process/OpenMP (SURVEY.md section 2); all scale-out
here is new, expressed with ``jax.sharding.Mesh`` + named shardings so XLA
inserts the collectives (ICI within a slice).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(axis_sizes: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Builds a mesh over the available devices.

    Args:
      axis_sizes: sizes per axis; defaults to all devices on one axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    assert int(np.prod(axis_sizes)) == len(devices), \
        f"mesh {axis_sizes} != {len(devices)} devices"
    arr = np.asarray(devices).reshape(axis_sizes)
    return Mesh(arr, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) axis across ``axis``."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
