"""Automatic device-format selection for hierarchy operators.

Priority (TPU cost model): DIA (shift-multiply-add, no gathers) → dense
(MXU matmul) for small operators → padded-ELL gather fallback.
"""

from __future__ import annotations

import numpy as np

from .dia import SparseDIA
from .ell import SparseELL
from .linop import DenseOp

__all__ = ["device_operator", "count_diagonals"]

DIA_MAX_OFFSETS = 96
DENSE_MAX = 2048


def count_diagonals(A_csr) -> int:
    coo = A_csr.tocoo()
    return int(np.unique(coo.col.astype(np.int64) -
                         coo.row.astype(np.int64)).size)


def device_operator(A_csr, dia_max_offsets: int = DIA_MAX_OFFSETS,
                    dense_max: int = DENSE_MAX, dtype=None):
    """Pick the best device representation for a host CSR operator."""
    import scipy.sparse as sp

    A_csr = sp.csr_matrix(A_csr)
    n, m = A_csr.shape
    try:
        if count_diagonals(A_csr) <= dia_max_offsets:
            return SparseDIA.from_scipy(A_csr, max_offsets=dia_max_offsets,
                                        dtype=dtype)
    except ValueError:
        pass
    if n <= dense_max and m <= dense_max:
        import jax.numpy as jnp

        mat = A_csr.toarray()
        if dtype is not None:
            mat = mat.astype(dtype)
        return DenseOp(mat=jnp.asarray(mat), shape=(n, m))
    return SparseELL.from_scipy(A_csr, dtype=dtype)
