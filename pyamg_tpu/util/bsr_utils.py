"""BSR row access helpers.

Reference parity: pyamg/util/BSR_utils.py (``BSR_Get_Row`` :11,
``BSR_Row_WriteScalar`` :66, ``BSR_Row_WriteVect`` :113).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["bsr_get_row", "bsr_row_write_scalar", "bsr_row_write_vector"]


def _row_block(A, i):
    bs = A.blocksize[0]
    brow = i // bs
    local = i % bs
    s, e = A.indptr[brow], A.indptr[brow + 1]
    return brow, local, s, e


def bsr_get_row(A, i):
    """Return (values, col_indices) of scalar row i of BSR matrix A."""
    if not (sp.issparse(A) and A.format == "bsr"):
        raise TypeError("expected BSR matrix")
    brow, local, s, e = _row_block(A, i)
    bsc = A.blocksize[1]
    vals = A.data[s:e, local, :].reshape(-1)
    cols = (A.indices[s:e][:, None] * bsc +
            np.arange(bsc)[None, :]).reshape(-1)
    nz = vals != 0
    return vals[nz], cols[nz]


def bsr_row_write_scalar(A, i, value):
    """Set every stored entry of scalar row i to ``value`` (in place)."""
    if not (sp.issparse(A) and A.format == "bsr"):
        raise TypeError("expected BSR matrix")
    brow, local, s, e = _row_block(A, i)
    A.data[s:e, local, :] = value
    return A


def bsr_row_write_vector(A, i, values):
    """Overwrite the stored entries of scalar row i with ``values`` (length
    = number of stored scalar entries in that row), in place."""
    if not (sp.issparse(A) and A.format == "bsr"):
        raise TypeError("expected BSR matrix")
    brow, local, s, e = _row_block(A, i)
    bsc = A.blocksize[1]
    values = np.asarray(values).reshape(e - s, bsc)
    A.data[s:e, local, :] = values
    return A


# reference-name aliases (pyamg/util/BSR_utils.py)
BSR_Get_Row = bsr_get_row
BSR_Row_WriteScalar = bsr_row_write_scalar
BSR_Row_WriteVect = bsr_row_write_vector
__all__ += ["BSR_Get_Row", "BSR_Row_WriteScalar", "BSR_Row_WriteVect"]
