"""Classical AMG interpolation.

Reference parity: pyamg/classical/interpolate.py (``direct_interpolation``
:13) and the two-pass kernels rs_direct_interpolation_pass1/pass2
(ruge_stuben.h:497,520), vectorized over rows with numpy, plus a standard
(distance-2) interpolation equivalent of ``rs_standard_interpolation``
(ruge_stuben.h:601 — present in the reference header but unexported).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..util.utils import to_csr

__all__ = ["direct_interpolation", "standard_interpolation"]


def direct_interpolation(A, C, splitting):
    """Direct interpolation P from the C/F splitting.

    For an F point i:  P_ij = -(alpha_or_beta / a_ii') * a_ij over strong C
    neighbors j, with alpha = (sum of all negative off-diag) / (sum of strong
    negative), beta likewise for positive entries (lumped into the diagonal
    when there are no strong positive connections).  C-point rows are
    identity.  (Multigrid, Trottenberg et al., p. 479.)

    Examples
    --------
    >>> from pyamg_tpu.gallery import poisson
    >>> import numpy as np
    >>> A = poisson((5,), format='csr')
    >>> splitting = np.array([1, 0, 1, 0, 1], dtype=np.int32)
    >>> P = direct_interpolation(A, A, splitting)
    >>> P.toarray()
    array([[1. , 0. , 0. ],
           [0.5, 0.5, 0. ],
           [0. , 1. , 0. ],
           [0. , 0.5, 0.5],
           [0. , 0. , 1. ]])
    """
    A = to_csr(A)
    C = to_csr(C)
    splitting = np.asarray(splitting, dtype=np.int32)
    n = A.shape[0]

    # copy A's entries onto C's pattern
    S = C.copy()
    S.data = np.ones_like(S.data)
    S = S.multiply(A).tocsr()
    S.sort_indices()

    # per-row sums over A
    rows_A = np.repeat(np.arange(n), np.diff(A.indptr))
    offdiag_A = rows_A != A.indices
    neg_A = (A.data.real < 0) & offdiag_A
    pos_A = (A.data.real >= 0) & offdiag_A
    sum_all_neg = np.zeros(n, dtype=A.dtype)
    sum_all_pos = np.zeros(n, dtype=A.dtype)
    np.add.at(sum_all_neg, rows_A[neg_A], A.data[neg_A])
    np.add.at(sum_all_pos, rows_A[pos_A], A.data[pos_A])
    diag = A.diagonal().astype(A.dtype).copy()

    # per-row sums over strong C off-diagonal connections
    rows_S = np.repeat(np.arange(n), np.diff(S.indptr))
    strongC = (splitting[S.indices] == 1) & (rows_S != S.indices)
    neg_S = strongC & (S.data.real < 0)
    pos_S = strongC & (S.data.real >= 0)
    sum_strong_neg = np.zeros(n, dtype=A.dtype)
    sum_strong_pos = np.zeros(n, dtype=A.dtype)
    np.add.at(sum_strong_neg, rows_S[neg_S], S.data[neg_S])
    np.add.at(sum_strong_pos, rows_S[pos_S], S.data[pos_S])

    no_pos = sum_strong_pos == 0
    diag = diag + np.where(no_pos, sum_all_pos, 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = np.where(sum_strong_neg != 0,
                         sum_all_neg / np.where(sum_strong_neg != 0,
                                                sum_strong_neg, 1), 0)
        beta = np.where(no_pos, 0,
                        sum_all_pos / np.where(sum_strong_pos != 0,
                                               sum_strong_pos, 1))
        neg_coeff = -alpha / diag
        pos_coeff = -beta / diag

    # F rows: entries at strong C neighbors
    keepF = strongC & (splitting[rows_S] == 0)
    valsF = np.where(S.data.real < 0, neg_coeff[rows_S], pos_coeff[rows_S])
    valsF = valsF * S.data

    # column map to coarse indices
    cmap = np.cumsum(splitting) - splitting

    rowsP = np.concatenate([rows_S[keepF], np.flatnonzero(splitting == 1)])
    colsP = np.concatenate([cmap[S.indices[keepF]],
                            cmap[np.flatnonzero(splitting == 1)]])
    valsP = np.concatenate([valsF[keepF],
                            np.ones(int(splitting.sum()), dtype=A.dtype)])
    nc = int(splitting.sum())
    P = sp.coo_matrix((valsP, (rowsP, colsP)), shape=(n, nc)).tocsr()
    P.sort_indices()
    return P


def standard_interpolation(A, C, splitting):
    """Standard (distance-2 aware) interpolation: for F point i, weak/strong
    F neighbors are distributed through their own strong C connections
    (Trottenberg et al., A.7.2).  Equivalent role to the unexported
    rs_standard_interpolation (ruge_stuben.h:601)."""
    A = to_csr(A)
    C = to_csr(C)
    splitting = np.asarray(splitting, dtype=np.int32)
    n = A.shape[0]

    S = C.copy()
    S.data = np.ones_like(S.data)
    S = S.multiply(A).tocsr()
    S.sort_indices()

    cmap = np.cumsum(splitting) - splitting
    nc = int(splitting.sum())

    rows_out, cols_out, vals_out = [], [], []
    Ap, Aj, Ax = A.indptr, A.indices, A.data
    Sp, Sj, Sx = S.indptr, S.indices, S.data

    for i in range(n):
        if splitting[i] == 1:
            rows_out.append([i])
            cols_out.append([cmap[i]])
            vals_out.append([1.0])
            continue
        # strong C neighbors of i
        srow = Sj[Sp[i]:Sp[i + 1]]
        sval = Sx[Sp[i]:Sp[i + 1]]
        m = (splitting[srow] == 1) & (srow != i)
        Ci = srow[m]
        if Ci.size == 0:
            continue
        w = dict(zip(Ci.tolist(), sval[m].tolist()))
        diag = 0.0
        arow = Aj[Ap[i]:Ap[i + 1]]
        aval = Ax[Ap[i]:Ap[i + 1]]
        strong_set = set(srow[(splitting[srow] == 1) | (srow == i)].tolist())
        strongF = set(srow[(splitting[srow] == 0) & (srow != i)].tolist())
        for j, a in zip(arow, aval):
            if j == i:
                diag += a
            elif j in strongF:
                # distribute a_ij over j's strong C connections shared with i
                sj = Sj[Sp[j]:Sp[j + 1]]
                sv = Sx[Sp[j]:Sp[j + 1]]
                mj = (splitting[sj] == 1)
                common = np.isin(sj[mj], Ci)
                denom = sv[mj][common].sum()
                if denom != 0:
                    for k, akj in zip(sj[mj][common], sv[mj][common]):
                        w[int(k)] = w.get(int(k), 0.0) + a * akj / denom
                else:
                    diag += a       # lump
            elif j not in strong_set:
                diag += a           # weak connection: lump into diagonal
        if diag == 0:
            continue
        for k, wk in w.items():
            rows_out.append([i])
            cols_out.append([cmap[k]])
            vals_out.append([-wk / diag])

    P = sp.coo_matrix(
        (np.concatenate(vals_out).astype(A.dtype),
         (np.concatenate(rows_out), np.concatenate(cols_out))),
        shape=(n, nc)).tocsr()
    return P
