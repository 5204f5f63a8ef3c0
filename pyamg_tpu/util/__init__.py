"""Utility layer: dense linalg helpers and sparse/setup utilities."""

from . import linalg, utils
from .linalg import (approximate_spectral_radius, condest, cond, ishermitian,
                     infinity_norm, norm, pinv_array, pinv_array_jax,
                     residual_norm)
from .utils import (unpack_arg, diag_sparse, get_diagonal, get_block_diag,
                    coord2rbm, profile_solver)

__all__ = [
    "linalg", "utils", "approximate_spectral_radius", "condest", "cond",
    "ishermitian", "infinity_norm", "norm", "pinv_array", "pinv_array_jax",
    "residual_norm", "unpack_arg", "diag_sparse", "get_diagonal",
    "get_block_diag", "coord2rbm", "profile_solver",
]
