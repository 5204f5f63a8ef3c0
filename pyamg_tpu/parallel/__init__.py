"""Distributed (multi-chip) execution over jax.sharding meshes."""

from .sharding import (make_mesh, shard_solver, ShardedSolver, pad_to,
                       shard_structured_solver, StructuredShardedSolver)
from .setup import (structured_sa_setup_sharded, general_sa_setup_sharded,
                    rootnode_setup_sharded, adaptive_sa_setup_sharded)
from .classical_setup import classical_setup_sharded

__all__ = ["make_mesh", "shard_solver", "ShardedSolver", "pad_to",
           "shard_structured_solver", "StructuredShardedSolver",
           "structured_sa_setup_sharded", "general_sa_setup_sharded",
           "rootnode_setup_sharded", "adaptive_sa_setup_sharded",
           "classical_setup_sharded"]
