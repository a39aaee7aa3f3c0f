"""Mesh sharding and multi-chip scale-out."""

from .mesh import CHAIN_AXIS, chain_mesh, replicate, shard_chains  # noqa: F401
