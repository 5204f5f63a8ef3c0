"""Utility layer: dense linalg helpers and sparse/setup utilities."""

from . import linalg, utils, bsr_utils, checkpoint, profiling
from .linalg import (approximate_spectral_radius, condest, cond, ishermitian,
                     infinity_norm, norm, pinv_array, pinv_array_jax,
                     residual_norm)
from .utils import (unpack_arg, diag_sparse, get_diagonal, get_block_diag,
                    coord2rbm, profile_solver)

from .checkpoint import save_hierarchy, load_hierarchy
from .profiling import profile_cycles, hierarchy_spectrum

__all__ = [
    "linalg", "utils", "bsr_utils", "checkpoint", "profiling",
    "save_hierarchy", "load_hierarchy", "profile_cycles",
    "hierarchy_spectrum",
    "approximate_spectral_radius", "condest", "cond",
    "ishermitian", "infinity_norm", "norm", "pinv_array", "pinv_array_jax",
    "residual_norm", "unpack_arg", "diag_sparse", "get_diagonal",
    "get_block_diag", "coord2rbm", "profile_solver",
]
