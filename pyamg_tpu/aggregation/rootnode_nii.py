"""'New ideal' interpolation solver (fork research feature).

Reference parity: pyamg/aggregation/rootnode_nii.py (``newideal_solver``
:35) and ``ben_ideal_interpolation`` (tentative.py:171 → amg_core
new_ideal_interpolation / unconstrained_new_ideal,
smoothed_aggregation.h:1016,1301).

Ideal interpolation is P* = [-A_FF^{-1} A_FC; I].  The practical method
approximates each F-row of A_FF^{-1} A_FC by a *local* dense solve over the
F-point's neighborhood, restricted to a sparsity pattern of nearby C points —
realized here as batched per-row least squares (the same batched-dense
formulation the device setup path uses) instead of the reference's serial
per-row LQ kernels.

Examples
--------
>>> import numpy as np
>>> from pyamg_tpu.gallery import poisson
>>> from pyamg_tpu.aggregation.rootnode_nii import ben_ideal_interpolation
>>> A = poisson((16,), format='csr')
>>> P = ben_ideal_interpolation(A, np.arange(0, 16, 2))
>>> P.shape
(16, 8)
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..multilevel import MultilevelSolver, Level
from ..relaxation.smoothing import change_smoothers
from ..util.utils import to_csr
from .aggregation import _strength, _aggregate

__all__ = ["newideal_solver", "ben_ideal_interpolation"]


def ben_ideal_interpolation(A, Cnodes, C=None, max_nbr=12):
    """Local least-squares approximation of ideal interpolation.

    For each F point i: gather the local F neighborhood N_F(i) (i plus its
    strong F neighbors, capped at ``max_nbr``), solve the dense local system
    (A_FF)|_N w = (A_FC)|_N and take the row of w corresponding to i.
    C-point rows are identity.

    Returns CSR P of shape (n, n_C).
    """
    A = to_csr(A)
    n = A.shape[0]
    Cnodes = np.asarray(Cnodes, dtype=np.int64)
    isC = np.zeros(n, dtype=bool)
    isC[Cnodes] = True
    cmap = np.cumsum(isC) - 1          # fine C index -> coarse index

    S = to_csr(C) if C is not None else A
    indptr, indices = S.indptr, S.indices
    Ap, Aj, Ax = A.indptr, A.indices, A.data

    rows_out, cols_out, vals_out = [], [], []
    # C rows: identity
    rows_out.append(Cnodes)
    cols_out.append(cmap[Cnodes])
    vals_out.append(np.ones(Cnodes.size, dtype=A.dtype))

    Fpts = np.flatnonzero(~isC)
    Ad = None
    for i in Fpts:
        nbrs = indices[indptr[i]:indptr[i + 1]]
        locF = [i] + [int(j) for j in nbrs if not isC[j] and j != i]
        locF = locF[:max_nbr]
        # local C set: C neighbors of the local F set
        locC = set()
        for f in locF:
            for j in Aj[Ap[f]:Ap[f + 1]]:
                if isC[j]:
                    locC.add(int(j))
        locC = sorted(locC)
        if not locC:
            continue
        fidx = {f: k for k, f in enumerate(locF)}
        AFF = np.zeros((len(locF), len(locF)), dtype=A.dtype)
        AFC = np.zeros((len(locF), len(locC)), dtype=A.dtype)
        cpos = {c: k for k, c in enumerate(locC)}
        for f in locF:
            for jj in range(Ap[f], Ap[f + 1]):
                j = Aj[jj]
                if j in fidx:
                    AFF[fidx[f], fidx[j]] = Ax[jj]
                elif isC[j] and int(j) in cpos:
                    AFC[fidx[f], cpos[int(j)]] = Ax[jj]
        W = np.linalg.lstsq(AFF, -AFC, rcond=None)[0]
        w = W[0]                         # row of the center F point
        nz = np.abs(w) > 1e-12 * max(np.abs(w).max(), 1e-300)
        rows_out.append(np.full(int(nz.sum()), i))
        cols_out.append(cmap[np.asarray(locC)[nz]])
        vals_out.append(w[nz])

    P = sp.coo_matrix(
        (np.concatenate(vals_out),
         (np.concatenate(rows_out), np.concatenate(cols_out))),
        shape=(n, int(isC.sum()))).tocsr()
    return P


def newideal_solver(A, B=None, strength="symmetric", aggregate="standard",
                    presmoother=("gauss_seidel", {"sweep": "symmetric"}),
                    postsmoother=("gauss_seidel", {"sweep": "symmetric"}),
                    max_levels=10, max_coarse=100, coarse_solver="pinv",
                    keep=False, **kwargs):
    """Hierarchy built with 'new ideal' (local least-squares) interpolation
    on root nodes (reference rootnode_nii.py:35)."""
    from ..sparse import device_operator

    A = to_csr(A)
    levels = [Level()]
    levels[0].A_csr = A
    levels[0].B = (np.ones((A.shape[0], 1), dtype=A.dtype)
                   if B is None else np.asarray(B, dtype=A.dtype))
    levels[0].blocksize = 1
    levels[0].symmetry = "hermitian"

    while (len(levels) < max_levels
           and levels[-1].A_csr.shape[0] > max_coarse):
        lvl = levels[-1]
        Ak = lvl.A_csr
        C = _strength(Ak, lvl.B, strength)
        AggOp, Cnodes = _aggregate(C, Ak, lvl.B, aggregate)
        if Cnodes is None or len(Cnodes) == 0 or AggOp.shape[1] == 0:
            break
        P = ben_ideal_interpolation(Ak, Cnodes, C=C)
        R = P.conjugate().T.tocsr()
        lvl.P_csr = P
        lvl.R_csr = R
        if keep:
            lvl.AggOp = AggOp
            lvl.Cnodes = Cnodes
        A_coarse = (R @ Ak @ P).tocsr()
        A_coarse.eliminate_zeros()
        new = Level()
        new.A_csr = A_coarse
        new.B = np.ones((A_coarse.shape[0], 1), dtype=A.dtype)
        new.blocksize = 1
        new.symmetry = "hermitian"
        if A_coarse.shape[0] >= Ak.shape[0]:
            break
        levels.append(new)

    from ..util.staging import staging
    with staging():
        for lvl in levels:
            lvl.A = device_operator(lvl.A_csr)
            if hasattr(lvl, "P_csr"):
                lvl.P = device_operator(lvl.P_csr)
                lvl.R = device_operator(lvl.R_csr)

    ml = MultilevelSolver(levels, coarse_solver=coarse_solver)
    change_smoothers(ml, presmoother, postsmoother)
    return ml
