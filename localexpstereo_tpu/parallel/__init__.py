"""Mesh / sharding layer: data-parallel pair batches, spatial halo sharding."""
from .mesh import data_sharding, make_mesh, replicated  # noqa: F401
