"""Krylov solvers with the uniform (A, b, ...) -> (x, info) contract.

Reference parity: pyamg/krylov/__init__.py:6-14.
"""

from ._cg import cg
from ._cgs_family import (cr, cgne, cgnr, steepest_descent, minimal_residual,
                          bicgstab)
from ._gmres import gmres, gmres_mgs, gmres_householder, fgmres

__all__ = ["cg", "cr", "cgne", "cgnr", "bicgstab", "gmres", "gmres_mgs",
           "gmres_householder", "fgmres", "steepest_descent",
           "minimal_residual"]
