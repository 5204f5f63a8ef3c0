"""Distributed (multi-chip) execution over jax.sharding meshes."""

from .sharding import (make_mesh, shard_solver, ShardedSolver, pad_to,
                       shard_structured_solver, StructuredShardedSolver)

__all__ = ["make_mesh", "shard_solver", "ShardedSolver", "pad_to",
           "shard_structured_solver", "StructuredShardedSolver"]
