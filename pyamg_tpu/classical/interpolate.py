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

from ..util.utils import to_csr, row_reduce

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

    from ..amg_core import direct_interpolation_native

    A.sort_indices()
    C.sort_indices()
    cmap_n = np.cumsum(splitting) - splitting
    P = direct_interpolation_native(A, C, splitting, cmap_n,
                                    int(splitting.sum()))
    if P is not None:
        return P

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
    sum_all_neg = row_reduce(np.where(neg_A, A.data, 0), A.indptr,
                             np.add, 0.0)
    sum_all_pos = row_reduce(np.where(pos_A, A.data, 0), A.indptr,
                             np.add, 0.0)
    diag = A.diagonal().astype(A.dtype).copy()

    # per-row sums over strong C off-diagonal connections
    rows_S = np.repeat(np.arange(n), np.diff(S.indptr))
    strongC = (splitting[S.indices] == 1) & (rows_S != S.indices)
    neg_S = strongC & (S.data.real < 0)
    pos_S = strongC & (S.data.real >= 0)
    sum_strong_neg = row_reduce(np.where(neg_S, S.data, 0), S.indptr,
                                np.add, 0.0)
    sum_strong_pos = row_reduce(np.where(pos_S, S.data, 0), S.indptr,
                                np.add, 0.0)

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


def _masked_product_csr(Aop, Bop, pattern):
    """(Aop @ Bop) restricted to ``pattern``'s sparsity, via the native
    masked SpGEMM when available (pattern entries only are computed)."""
    from ..amg_core import masked_spgemm_native

    out = masked_spgemm_native(Aop, Bop, pattern)
    if out is not None:
        return out
    # fallback: full product, then gather the pattern entries (explicit
    # zeros kept so the result stays index-aligned with the pattern)
    full = (Aop @ Bop).tocsr()
    full.sort_indices()
    ncols = pattern.shape[1]
    pr = np.repeat(np.arange(pattern.shape[0], dtype=np.int64),
                   np.diff(pattern.indptr))
    fr = np.repeat(np.arange(full.shape[0], dtype=np.int64),
                   np.diff(full.indptr))
    pk = pr * ncols + pattern.indices
    fk = fr * ncols + full.indices
    data = np.zeros(pattern.nnz, dtype=full.dtype)
    if fk.size:
        pos = np.minimum(np.searchsorted(fk, pk), fk.size - 1)
        hit = fk[pos] == pk
        data = np.where(hit, full.data[pos], 0)
    return sp.csr_matrix((data, pattern.indices.copy(),
                          pattern.indptr.copy()), shape=pattern.shape)


def standard_interpolation(A, C, splitting):
    """Standard (distance-2 aware) interpolation: for F point i, strong-F
    neighbors are distributed through their own strong C connections shared
    with C_i (Trottenberg et al., A.7.2).  Equivalent role to the unexported
    rs_standard_interpolation (ruge_stuben.h:601).

    Vectorized: both pair-dependent quantities are pattern-restricted
    products —
      denom(i,j)  = sum_{m in C_i}  a_jm          (pattern: strong F-F edges)
      contrib(i,k) = sum_j (a_ij/denom(i,j)) a_jk (pattern: strong C of i)
    """
    A = to_csr(A)
    C = to_csr(C)
    splitting = np.asarray(splitting, dtype=np.int32)
    n = A.shape[0]

    from ..amg_core import (pattern_values_native,
                            standard_interpolation_native)

    # S = A's values on C's pattern.  The native two-pointer merge shares
    # C's index arrays (zero copies); the scipy ``multiply`` path costs a
    # full binopt merge + three O(nnz) copies per level.
    A.sort_indices()
    C.sort_indices()
    S_data = pattern_values_native(C, A)
    if S_data is not None:
        S = sp.csr_matrix((S_data, C.indices, C.indptr), shape=C.shape)
        S.has_sorted_indices = True
    else:
        S = C.copy()
        S.data = np.ones_like(S.data)
        S = S.multiply(A).tocsr()
        S.sort_indices()

    cmap = np.cumsum(splitting) - splitting
    nc = int(splitting.sum())

    P = standard_interpolation_native(A, S, splitting, cmap, nc)
    if P is not None:
        return P

    isC = splitting == 1

    rows_S = np.repeat(np.arange(n), np.diff(S.indptr))
    offd = rows_S != S.indices
    sC = offd & isC[S.indices]              # strong C connections
    sF = offd & ~isC[S.indices]             # strong F connections

    # fresh index arrays: eliminate_zeros compacts them in place
    SC = sp.csr_matrix((np.where(sC, S.data, 0), S.indices.copy(),
                        S.indptr.copy()), shape=S.shape)
    SC.eliminate_zeros()
    SC.sort_indices()
    SF = sp.csr_matrix((np.where(sF, S.data, 0), S.indices.copy(),
                        S.indptr.copy()), shape=S.shape)
    SF.eliminate_zeros()
    SF.sort_indices()

    # denom(i,j) on the strong F-F pattern: row i's C-membership indicator
    # dotted with row j of SC  ==  (Pind @ SC^T) masked to SF
    Pind = SC.copy()
    Pind.data = np.ones_like(Pind.data)
    denom = _masked_product_csr(Pind, SC.T, SF)

    # distribute: B_ij = a_ij / denom(i,j); zero-denominator strong-F
    # connections are lumped into the diagonal instead
    B = SF.copy()
    dd = denom.data
    zero_den = dd == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        B.data = np.where(zero_den, 0.0, B.data / np.where(zero_den, 1, dd))
    lump = row_reduce(np.where(zero_den, SF.data, 0), SF.indptr, np.add, 0.0)

    contrib = _masked_product_csr(B, SC, SC)

    # w_ik = a_ik + contrib_ik on the strong-C pattern
    w_vals = SC.data + contrib.data

    # d_i = a_ii + weak off-diagonal mass + zero-denominator lumping;
    # weak = off-diagonal A entries not stored in S
    rows_A = np.repeat(np.arange(n), np.diff(A.indptr))
    offsum_A = row_reduce(np.where(rows_A != A.indices, A.data, 0),
                          A.indptr, np.add, 0.0)
    offsum_S = row_reduce(np.where(offd, S.data, 0), S.indptr, np.add, 0.0)
    diag = A.diagonal() + (offsum_A - offsum_S) + lump

    rows_SC = np.repeat(np.arange(n), np.diff(SC.indptr))
    keep = (splitting[rows_SC] == 0) & (diag[rows_SC] != 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        valsF = -w_vals / np.where(diag[rows_SC] != 0, diag[rows_SC], 1)

    cpts = np.flatnonzero(isC)
    rowsP = np.concatenate([rows_SC[keep], cpts])
    colsP = np.concatenate([cmap[SC.indices[keep]], cmap[cpts]])
    valsP = np.concatenate([valsF[keep],
                            np.ones(nc, dtype=A.dtype)])
    P = sp.coo_matrix((valsP.astype(A.dtype), (rowsP, colsP)),
                      shape=(n, nc)).tocsr()
    P.sort_indices()
    return P


def _standard_interpolation_loop(A, C, splitting):
    """Reference per-row implementation of standard interpolation; kept as
    the test oracle for the vectorized version above."""
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
