"""Construct sparse matrices from local stencils on regular grids.

Reference parity: pyamg/gallery/stencil.py (``stencil_grid``).  Built fresh as
a vectorized COO assembly: one batch of entries per stencil offset, with
out-of-grid neighbors dropped (homogeneous Dirichlet truncation).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["stencil_grid"]


def stencil_grid(S, grid, dtype=None, format=None):
    """Sparse matrix for a local (2k+1)^d stencil applied on a regular grid.

    Parameters
    ----------
    S : ndarray with odd extents; ``S[k, ..., k]`` is the diagonal entry.
    grid : tuple of grid dimensions, e.g. ``(100, 100)``.
    format : scipy sparse format string ('csr' default).

    Returns
    -------
    scipy sparse matrix of shape (prod(grid), prod(grid)).

    Examples
    --------
    >>> stencil_grid([-1.0, 2.0, -1.0], (4,)).toarray()
    array([[ 2., -1.,  0.,  0.],
           [-1.,  2., -1.,  0.],
           [ 0., -1.,  2., -1.],
           [ 0.,  0., -1.,  2.]])
    """
    S = np.asarray(S, dtype=dtype)
    grid = tuple(int(g) for g in grid)
    if S.ndim != len(grid):
        raise ValueError("stencil rank must match grid rank")
    if min(grid) < 1:
        raise ValueError(f"invalid grid shape: {grid}")
    if any(s % 2 == 0 for s in S.shape):
        raise ValueError("stencil must have odd extents in every dimension")

    N = int(np.prod(grid))
    centers = tuple(s // 2 for s in S.shape)
    strides = np.array([int(np.prod(grid[d + 1:])) for d in range(len(grid))],
                       dtype=np.int64)

    coords = np.unravel_index(np.arange(N, dtype=np.int64), grid)

    rows_all, cols_all, vals_all = [], [], []
    for off_idx in np.argwhere(S != 0):
        off = off_idx - np.array(centers)
        val = S[tuple(off_idx)]
        valid = np.ones(N, dtype=bool)
        for d, o in enumerate(off):
            if o:
                valid &= (coords[d] + o >= 0) & (coords[d] + o < grid[d])
        rows = np.flatnonzero(valid)
        rows_all.append(rows)
        cols_all.append(rows + int(off @ strides))
        vals_all.append(np.full(rows.size, val, dtype=S.dtype))

    A = sp.coo_matrix(
        (np.concatenate(vals_all),
         (np.concatenate(rows_all), np.concatenate(cols_all))),
        shape=(N, N),
    )
    A.sum_duplicates()
    fmt = format or "csr"
    A = A.asformat(fmt)
    try:
        A.grid = grid       # structured-grid metadata for the TPU fast path
    except AttributeError:
        pass
    return A
