"""Distributed hierarchy CONSTRUCTION (the setup phase) over a device mesh.

SURVEY §7 step 8 ("shard levels, distributed RAP and setup"): the solve
phase has been sharded since round 1 (sharding.py), but a hierarchy that is
*built* serially on one host bottlenecks an N-chip deployment on setup.
For grid-structured problems every numeric setup step is already a pure
jax program (aggregation/device_setup.py): power-iteration spectral radius,
DIA smoothing factor, tentative pooling, and the comb-probe Galerkin RAP
(role of the reference's serial ``A_c = R * A * P``, aggregation.py:429).
Row-sharding the fine operator's diagonals and the candidate over a 1-D
mesh turns each level build into one SPMD program: XLA inserts the halo
permutes for the DIA shifts and psums for the norms, and each coarse
operator comes out of the jit already sharded — construction itself is
distributed, and the coarse levels never exist unsharded anywhere.
"""

from __future__ import annotations

from .sharding import make_mesh

__all__ = ["structured_sa_setup_sharded"]


def structured_sa_setup_sharded(A, grid, mesh=None, n_devices=None,
                                axis_name: str = "rows", **kw):
    """Build a structured SA hierarchy with the SETUP distributed over a
    mesh (row-sharded diagonals, SPMD level builds, sharded coarse
    operators).  ``A`` may be scipy CSR or a SparseDIA; remaining keyword
    arguments match :func:`~pyamg_tpu.aggregation.device_setup.
    structured_sa_setup`.

    The resulting hierarchy's operators live sharded on the mesh; its
    compiled cycles execute SPMD.  Numerically identical to the
    single-device build up to reduction reassociation in the power
    iteration's norms.
    """
    from ..aggregation.device_setup import structured_sa_setup

    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    return structured_sa_setup(A, grid, mesh=mesh, **kw)
