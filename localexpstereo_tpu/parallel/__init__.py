"""Mesh / sharding layer: data-parallel pair batches (``batch``/``replica``),
spatial halo sharding (``volume``), disparity-axis volume sharding at
production scale (``dvolume``)."""
from .mesh import data_sharding, make_mesh, replicated  # noqa: F401
