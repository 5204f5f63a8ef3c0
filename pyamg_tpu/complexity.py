"""Analytic work models for setup and cycle cost.

Reference parity: pyamg/Jacob_complexity.py (``setup_complexity`` :14,
``cycle_complexity`` :118) — FLOP-work estimates in units of fine-level nnz.
"""

from __future__ import annotations

__all__ = ["setup_complexity", "cycle_complexity"]


def _nnz(lvl):
    return lvl.A_csr.nnz if hasattr(lvl, "A_csr") else lvl.A.nnz


def setup_complexity(ml, strength_cost=1.0, aggregation_cost=1.0,
                     tentative_cost=1.0, smooth_cost=3.0, rap_cost=6.0):
    """Approximate setup work in units of fine-grid nnz.

    Per level, charges (relative to that level's nnz): strength-of-connection,
    aggregation/splitting, tentative construction, prolongation smoothing
    (SpGEMM-dominated) and the Galerkin triple product.
    """
    fine_nnz = _nnz(ml.levels[0])
    total = 0.0
    for lvl in ml.levels[:-1]:
        nz = _nnz(lvl)
        total += nz * (strength_cost + aggregation_cost + tentative_cost +
                       smooth_cost + rap_cost)
    return total / fine_nnz


def cycle_complexity(ml, cycle="V", presmoother_cost=2.0,
                     postsmoother_cost=2.0):
    """Work of one cycle in units of fine-grid nnz (reference
    Jacob_complexity.py:118).  Counts smoother sweeps (cost per nnz),
    the residual SpMV and the P/R transfers per visit, weighted by how many
    times each level is visited for the given cycle type."""
    cycle = str(cycle).upper()
    nlevels = len(ml.levels)
    if cycle == "V":
        visits = [1] * nlevels
    elif cycle in ("W", "AMLI"):
        visits = [min(2 ** k, 2 ** k) for k in range(nlevels)]
    elif cycle == "F":
        visits = [k + 1 for k in range(nlevels)]
    else:
        raise ValueError(f"unrecognized cycle type {cycle!r}")

    fine_nnz = _nnz(ml.levels[0])
    total = 0.0
    for k, lvl in enumerate(ml.levels):
        nz = _nnz(lvl)
        if k == nlevels - 1:
            n_c = lvl.A.shape[0]
            total += visits[k] * n_c * n_c        # dense coarse solve
            continue
        p_nnz = lvl.P_csr.nnz if hasattr(lvl, "P_csr") else nz
        work = nz * (presmoother_cost + postsmoother_cost + 1.0) \
            + 2.0 * p_nnz
        total += visits[k] * work
    return total / fine_nnz
