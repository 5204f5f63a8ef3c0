"""Aggregation-based AMG: SA, root-node, adaptive, pairwise."""

from . import aggregate, tentative, smooth, matching
from .aggregation import smoothed_aggregation_solver
from .rootnode import rootnode_solver
from .adaptive import adaptive_sa_solver
from .new_adaptive import asa_solver, tl_sa_solver
from .rootnode_nii import newideal_solver, ben_ideal_interpolation
from .device_setup import structured_sa_setup
from .aggregate import (standard_aggregation, naive_aggregation,
                        lloyd_aggregation, pairwise_aggregation)
from .tentative import fit_candidates
from .smooth import (jacobi_prolongation_smoother,
                     richardson_prolongation_smoother,
                     energy_prolongation_smoother)

__all__ = [
    "aggregate", "tentative", "smooth", "matching",
    "smoothed_aggregation_solver", "rootnode_solver", "adaptive_sa_solver",
    "asa_solver", "tl_sa_solver", "newideal_solver",
    "ben_ideal_interpolation", "structured_sa_setup",
    "standard_aggregation", "naive_aggregation", "lloyd_aggregation",
    "pairwise_aggregation", "fit_candidates",
    "jacobi_prolongation_smoother", "richardson_prolongation_smoother",
    "energy_prolongation_smoother",
]
