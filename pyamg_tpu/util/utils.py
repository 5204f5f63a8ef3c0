"""General sparse/setup utilities (host side).

Reference parity: pyamg/util/utils.py (SURVEY.md §2.2 "Utilities") — the same
roles, freshly implemented with vectorized scipy/numpy (the reference calls
into amg_core C++ for several of these).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = [
    "unpack_arg", "diag_sparse", "scale_rows", "scale_columns",
    "symmetric_rescaling", "get_diagonal", "get_block_diag", "amalgamate",
    "unamal", "coord2rbm", "levelize_strength_or_aggregation",
    "levelize_smooth_or_improve_candidates", "scale_rows_by_largest_entry",
    "filter_matrix_rows", "filter_matrix_columns", "truncate_rows",
    "eliminate_diag_dom_nodes", "profile_solver", "to_csr",
    "relaxation_as_linear_operator", "filter_operator", "compute_BtBinv",
    "scale_T", "get_Cpt_params",
    # reference-surface compatibility (pyamg/util/utils.py)
    "blocksize", "to_type", "type_prep", "symmetric_rescaling_sa",
    "print_table", "Coord2RBM", "UnAmal", "hierarchy_spectrum",
]


def unpack_arg(v):
    """Decode the (name, kwargs) option pattern used throughout the API.

    Reference: ``unpack_arg`` duplicated at multilevel.py:600,
    aggregation.py:300, classical.py:122; here it lives in one place.
    """
    if isinstance(v, tuple):
        return v[0], dict(v[1])
    return v, {}


def to_csr(A):
    """Coerce input (scipy any-format, dense, SparseELL) to CSR."""
    from ..sparse import SparseELL, BlockELL

    if isinstance(A, (SparseELL, BlockELL)):
        return A.to_scipy().tocsr()
    if sp.issparse(A):
        return A.tocsr()
    return sp.csr_matrix(np.asarray(A))


def diag_sparse(A):
    """If A is sparse, return its diagonal; if a vector, return spdiags(A)."""
    if sp.issparse(A):
        return A.diagonal()
    a = np.asarray(A).ravel()
    return sp.dia_matrix((a[None, :], [0]), shape=(a.size, a.size)).tocsr()


def scale_rows(A, v, copy=True):
    A = A.tocsr() if sp.issparse(A) else sp.csr_matrix(A)
    if copy:
        A = A.copy()
    v = np.asarray(v).ravel()
    A.data *= np.repeat(v, np.diff(A.indptr))
    return A


def scale_columns(A, v, copy=True):
    A = A.tocsr() if sp.issparse(A) else sp.csr_matrix(A)
    if copy:
        A = A.copy()
    v = np.asarray(v).ravel()
    A.data *= v[A.indices]
    return A


def symmetric_rescaling(A, copy=True):
    """Return (D_sqrt, D_sqrt_inv, D^{-1/2} A D^{-1/2})."""
    d = np.asarray(A.diagonal()).ravel()
    mask = d != 0
    d_sqrt = np.sqrt(np.abs(d))
    d_sqrt_inv = np.zeros_like(d_sqrt)
    d_sqrt_inv[mask] = 1.0 / d_sqrt[mask]
    DAD = scale_rows(scale_columns(A, d_sqrt_inv, copy=copy), d_sqrt_inv,
                     copy=False)
    return d_sqrt, d_sqrt_inv, DAD


def get_diagonal(A, norm_eq=False, inv=False):
    """Diagonal of A, A A^H (norm_eq=1) or A^H A (norm_eq=2); optionally
    inverted with zeros preserved (reference util/utils.py:526).

    Examples
    --------
    >>> import numpy as np
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.util.utils import get_diagonal
    >>> A = poisson((4, 4), format='csr')
    >>> bool(np.all(get_diagonal(A) == 4.0))
    True
    >>> bool(np.all(get_diagonal(A, inv=True) == 0.25))
    True
    """
    A = to_csr(A)
    if norm_eq == 1:
        d = np.asarray((A.multiply(A.conjugate())).sum(axis=1)).ravel()
    elif norm_eq == 2:
        d = np.asarray((A.multiply(A.conjugate())).sum(axis=0)).ravel()
    else:
        d = np.asarray(A.diagonal()).ravel()
    if inv:
        mask = d != 0
        dinv = np.zeros_like(d)
        dinv[mask] = 1.0 / d[mask]
        return dinv
    return d


def get_block_diag(A, blocksize, inv_flag=True):
    """(n/bs, bs, bs) array of diagonal blocks of A, optionally inverted
    (batched pinv).  Reference util/utils.py:591 → amg_core pinv_array.

    A BSR input with the requested blocksize is used directly (callers
    holding a cached block form skip the CSR→BSR reconversion)."""
    n = A.shape[0]
    bs = int(blocksize)
    if n % bs:
        raise ValueError("matrix dimension must be divisible by blocksize")
    nb = n // bs
    if sp.issparse(A) and A.format == "bsr" and A.blocksize == (bs, bs):
        B = A
    else:
        B = sp.bsr_matrix(to_csr(A), blocksize=(bs, bs))
    blocks = np.zeros((nb, bs, bs), dtype=A.dtype)
    indptr, indices, data = B.indptr, B.indices, B.data
    brows = np.repeat(np.arange(nb), np.diff(indptr))
    isdiag = indices == brows
    # add.at: a non-canonical BSR may store the same block twice (scipy
    # sums duplicates on conversion; plain assignment would be last-wins)
    np.add.at(blocks, brows[isdiag], data[isdiag])
    if inv_flag:
        from .linalg import pinv_array

        return pinv_array(blocks)
    return blocks


def amalgamate(A, blocksize):
    """Collapse a blocked matrix to its block-connectivity graph (one entry
    per nonzero block).  Reference util/utils.py:685."""
    if blocksize == 1:
        return to_csr(A)
    B = sp.bsr_matrix(to_csr(A), blocksize=(blocksize, blocksize))
    nb = B.shape[0] // blocksize
    data = np.ones(B.indices.shape[0], dtype=A.dtype)
    return sp.csr_matrix((data, B.indices.copy(), B.indptr.copy()),
                         shape=(nb, nb))


def unamal(A, rows, cols):
    """Expand each entry of A into a (rows, cols) block of ones times the
    entry's value pattern (structure-only).  Reference util/utils.py:741."""
    A = to_csr(A)
    # kron(pattern, ones((rows, cols))) IS a BSR matrix with all-ones
    # blocks on A's structure — build it directly (no COO round-trip)
    blocks = np.ones((A.nnz, rows, cols))
    return sp.bsr_matrix((blocks, A.indices, A.indptr),
                         shape=(A.shape[0] * rows,
                                A.shape[1] * cols)).tocsr()


def coord2rbm(coords, numPDEs=None):
    """Rigid body modes from node coordinates (reference ``Coord2RBM``,
    util/utils.py:1009).

    2D -> 3 modes (2 translations + 1 rotation), 3D -> 6 modes.
    """
    coords = np.asarray(coords, dtype=float)
    n, d = coords.shape
    if numPDEs is None:
        numPDEs = d
    if d == 1 or numPDEs == 1:
        return np.ones((n * numPDEs, 1))
    if d == 2:
        B = np.zeros((2 * n, 3))
        B[0::2, 0] = 1
        B[1::2, 1] = 1
        B[0::2, 2] = -coords[:, 1]
        B[1::2, 2] = coords[:, 0]
        return B
    if d == 3:
        B = np.zeros((3 * n, 6))
        for k in range(3):
            B[k::3, k] = 1
        x, y, z = coords[:, 0], coords[:, 1], coords[:, 2]
        # rotations about z, y, x
        B[0::3, 3], B[1::3, 3] = -y, x
        B[0::3, 4], B[2::3, 4] = z, -x
        B[1::3, 5], B[2::3, 5] = -z, y
        return B
    raise ValueError("coords must be (n, 1|2|3)")


def _is_single_option(v):
    """True when v is one (name, kwargs) option rather than a per-level
    sequence."""
    if isinstance(v, str) or v is None:
        return True
    return (isinstance(v, tuple) and len(v) == 2 and isinstance(v[0], str)
            and isinstance(v[1], dict))


def levelize_strength_or_aggregation(to_levelize, max_levels, max_coarse):
    """Expand a strength/aggregation option into a per-level list
    (reference util/utils.py:1872)."""
    if _is_single_option(to_levelize):
        return max_levels, max_coarse, [to_levelize] * max(max_levels - 1, 1)
    if isinstance(to_levelize, (list, tuple)):
        to_levelize = list(to_levelize)
        if len(to_levelize) < max_levels - 1:
            to_levelize = to_levelize + \
                [to_levelize[-1]] * (max_levels - 1 - len(to_levelize))
        return max_levels, max_coarse, to_levelize
    raise ValueError(f"invalid option {to_levelize!r}")


def levelize_smooth_or_improve_candidates(to_levelize, max_levels):
    """Expand a smoother/improve_candidates option into a per-level list
    (reference util/utils.py:1956)."""
    if _is_single_option(to_levelize):
        return [to_levelize] * max_levels
    if isinstance(to_levelize, (list, tuple)):
        to_levelize = list(to_levelize)
        if len(to_levelize) < max_levels:
            to_levelize = to_levelize + \
                [to_levelize[-1]] * (max_levels - len(to_levelize))
        return to_levelize
    raise ValueError(f"invalid option {to_levelize!r}")


def row_reduce(vals, indptr, ufunc, empty=0.0):
    """Per-CSR-row reduction of ``vals`` (length nnz) with ``ufunc``
    (e.g. ``np.maximum``); rows with no entries get ``empty``.

    ``ufunc.reduceat`` over the non-empty row starts is ~50x faster than the
    equivalent ``ufunc.at`` scatter on large matrices.
    """
    n = len(indptr) - 1
    out = np.full(n, empty, dtype=vals.dtype)
    if vals.size and n:
        nz = np.diff(indptr) > 0
        starts = indptr[:-1][nz]
        out[nz] = ufunc.reduceat(vals, starts)
    return out


def scale_rows_by_largest_entry(A):
    """Scale each row so its largest-magnitude entry is 1
    (reference util/utils.py:1830)."""
    A = to_csr(A).copy()
    rowmax = row_reduce(np.abs(A.data), A.indptr, np.maximum, 0.0)
    scale = np.where(rowmax != 0, 1.0 / np.where(rowmax != 0, rowmax, 1), 0.0)
    A.data = A.data * np.repeat(scale, np.diff(A.indptr))
    return A


def filter_matrix_rows(A, theta, diagonal=False, lump=False):
    """Drop entries with |A_ij| < theta * max_k |A_ik| (off-diagonal max),
    optionally lumping dropped mass onto the diagonal
    (reference util/utils.py:2009)."""
    A = to_csr(A).copy()
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    offdiag = rows != A.indices
    mags = np.abs(A.data) * offdiag
    rowmax = row_reduce(mags, A.indptr, np.maximum, 0.0)
    keep = (np.abs(A.data) >= theta * rowmax[rows]) | (rows == A.indices)
    if not diagonal:
        keep |= ~offdiag
    dropped = A.data * (~keep)
    if lump:
        lumped = row_reduce(dropped, A.indptr, np.add, 0.0)
        A.data = np.where(keep, A.data, 0)
        A = A + sp.dia_matrix((lumped[None, :], [0]), shape=A.shape)
        A = A.tocsr()
    else:
        A.data = np.where(keep, A.data, 0)
    A.eliminate_zeros()
    return A


def filter_matrix_columns(A, theta):
    """Column analogue of ``filter_matrix_rows``
    (reference util/utils.py:2083)."""
    return filter_matrix_rows(to_csr(A).T.tocsr(), theta).T.tocsr()


def truncate_rows(A, nz_per_row):
    """Keep only the largest-magnitude ``nz_per_row`` entries in each row
    (reference util/utils.py:2153 → amg_core truncate_rows_csr)."""
    A = to_csr(A).copy()
    n = A.shape[0]
    indptr = A.indptr
    keep_mask = np.zeros(A.nnz, dtype=bool)
    for i in range(n):
        s, e = indptr[i], indptr[i + 1]
        if e - s <= nz_per_row:
            keep_mask[s:e] = True
        else:
            idx = np.argpartition(np.abs(A.data[s:e]), e - s - nz_per_row)
            keep_mask[s + idx[e - s - nz_per_row:]] = True
    A.data = np.where(keep_mask, A.data, 0)
    A.eliminate_zeros()
    return A


def eliminate_diag_dom_nodes(A, C, theta=1.02):
    """Mark strongly diagonally-dominant rows as isolated in the strength
    graph C (they need no coarse representation).
    Reference util/utils.py:1710."""
    A = to_csr(A)
    C = to_csr(C).copy()
    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    offdiag_sum = row_reduce(np.abs(A.data) * (rows != A.indices),
                             A.indptr, np.add, 0.0)
    diag = np.abs(A.diagonal())
    dom = diag > theta * offdiag_sum
    if not dom.any():
        return C
    # zero the dominant rows/cols of C, keep their diagonal
    keep = ~(dom[np.repeat(np.arange(n), np.diff(C.indptr))] |
             dom[C.indices])
    keep |= (np.repeat(np.arange(n), np.diff(C.indptr)) == C.indices)
    C.data = np.where(keep, C.data, 0)
    C.eliminate_zeros()
    return C


def profile_solver(ml, accel=None, **kwargs):
    """Residual history of one solve on a random RHS
    (reference util/utils.py:43)."""
    A = ml.levels[0].A_csr if hasattr(ml.levels[0], "A_csr") else None
    n = ml.levels[0].A.shape[0]
    rng = np.random.default_rng(0)
    b = A @ rng.random(n) if A is not None else rng.random(n)
    residuals = []
    if accel is None:
        ml.solve(b, residuals=residuals, **kwargs)
    else:
        ml.solve(b, residuals=residuals, accel=accel, **kwargs)
    return np.asarray(residuals)


def relaxation_as_linear_operator(method, A, b):
    """Wrap a relaxation method as a LinearOperator applying one smoothing
    pass on A x = b from the given x (reference util/utils.py:1129).

    Used by improve_candidates: applying it to B relaxes each candidate
    vector against A x = 0.
    """
    from scipy.sparse.linalg import LinearOperator
    from ..relaxation import relaxation as rel

    fn_name, kwargs = unpack_arg(method)
    if not hasattr(rel, fn_name):
        # device-only smoother names fall back to Gauss-Seidel on host
        fn_name, kwargs = "gauss_seidel", {"sweep": "symmetric"}
    fn = getattr(rel, fn_name)
    b = np.asarray(b)

    def matvec(x):
        x = np.array(x, dtype=A.dtype, copy=True)
        fn(A, x, b, **kwargs)
        return x

    return LinearOperator(A.shape, matvec, dtype=A.dtype)


def filter_operator(A, C, B, Bf, BtBinv=None):
    """Remove entries of A not in pattern C, preserving A @ B = Bf by a
    constrained per-row correction (reference util/utils.py:1207).

    A, C are sparse (n x m); B is (m, k) coarse candidates; Bf is (n, k).
    """
    A = to_csr(A)
    C = to_csr(C)
    B = np.asarray(B)
    Bf = np.asarray(Bf)
    n = A.shape[0]
    # restrict A to pattern of C
    pattern = C.copy()
    pattern.data = np.ones_like(pattern.data)
    Anew = A.multiply(pattern).tocsr()
    Anew.sort_indices()
    # per-row correction so that Anew @ B matches Bf:
    # solve min ||u|| s.t. u @ B[cols] = Bf[i] - Anew[i] @ B
    defect = Bf - Anew @ B
    rows_out, cols_out, vals_out = [], [], []
    for i in range(n):
        cols = Anew.indices[Anew.indptr[i]:Anew.indptr[i + 1]]
        if cols.size == 0:
            continue
        Bi = B[cols]                              # (nc, k)
        u = np.linalg.lstsq(Bi.conj().T, defect[i], rcond=None)[0]
        rows_out.append(np.full(cols.size, i))
        cols_out.append(cols)
        vals_out.append(u)
    if rows_out:
        U = sp.coo_matrix(
            (np.concatenate(vals_out),
             (np.concatenate(rows_out), np.concatenate(cols_out))),
            shape=Anew.shape).tocsr()
        Anew = (Anew + U).tocsr()
    Anew.eliminate_zeros()
    return Anew


def compute_BtBinv(B, sparsity):
    """Per-row Gram inverses: for each row i of the sparsity pattern, the
    pseudo-inverse of B[cols(i)]^H B[cols(i)]
    (reference util/utils.py:1617 → amg_core calc_BtB + pinv_array).

    Vectorized as one padded batched Gram + batched pinv — the same batched
    formulation the device path uses."""
    from .linalg import pinv_array

    from ..amg_core import pattern_gram_native

    S = to_csr(sparsity)
    B = np.asarray(B)
    k = B.shape[1]
    n = S.shape[0]
    nnz_row = np.diff(S.indptr)
    L = int(nnz_row.max()) if n else 0
    if L == 0:
        return np.zeros((n, k, k), dtype=B.dtype)
    if B.dtype == np.float64 and not np.iscomplexobj(B):
        gram = pattern_gram_native(S.indptr, S.indices, B)
        if gram is not None:
            return pinv_array(gram)
    rows = np.repeat(np.arange(n), nnz_row)
    offs = np.arange(S.nnz) - np.repeat(S.indptr[:-1], nnz_row)
    cols = np.zeros((n, L), dtype=np.int64)
    valid = np.zeros((n, L), dtype=bool)
    cols[rows, offs] = S.indices
    valid[rows, offs] = True
    Bp = B[cols] * valid[:, :, None]            # (n, L, k)
    gram = np.einsum("nlj,nlk->njk", Bp.conj(), Bp)
    return pinv_array(gram)


def scale_T(T, P_I, I_F, blocksize=1):
    """Scale the tentative prolongator so root-node rows are exactly identity
    (reference util/utils.py:1366): with S = pinv(P_I^T T) the per-aggregate
    coarse-column rescaling, T <- I_F T S + P_I.

    ``blocksize``: coarse dofs per aggregate — P_I^T T is block diagonal
    with (blocksize, blocksize) blocks, pseudo-inverted batch-wise (the
    reference pinv_array(D.data) call; a plain inverse fails on aggregates
    whose root-node candidate block is rank-deficient, e.g. coarse levels
    of 2D elasticity where 3 injected RBMs live on a 3-dof root node)."""
    T = to_csr(T)
    P_I = to_csr(P_I)
    I_F = to_csr(I_F)
    root_block = (P_I.T @ T).tocsr()           # (nc, nc), block diagonal
    nc = root_block.shape[0]
    bs = int(blocksize) if nc % max(int(blocksize), 1) == 0 else 1
    blocks = get_block_diag(root_block, bs, inv_flag=True)   # batched pinv
    data = np.ascontiguousarray(blocks)
    S = sp.bsr_matrix((data, np.arange(nc // bs), np.arange(nc // bs + 1)),
                      shape=(nc, nc)).tocsr()
    return (I_F @ T @ S + P_I).tocsr()


def get_Cpt_params(A, Cnodes, AggOp, T):
    """Index/projection bookkeeping for root-node methods
    (reference util/utils.py:1469).

    Returns dict with Cpts/Fpts (dof indices), P_I (injection from coarse
    dofs to fine root-node dofs) and I_F / I_C (F-/C-dof identity masks).
    """
    A = to_csr(A)
    T = to_csr(T)
    Cnodes = np.asarray(Cnodes, dtype=np.int64)
    blocksize = A.shape[0] // AggOp.shape[0]
    Cpts = (blocksize * Cnodes[:, None] + np.arange(blocksize)[None, :]).ravel()
    mask = np.zeros(A.shape[0], dtype=bool)
    mask[Cpts] = True
    Fpts = np.flatnonzero(~mask)

    n_fine, n_coarse = T.shape
    if Cpts.size == n_coarse:
        # root-node ordering: coarse dof j IS fine root dof Cpts[j]
        # (Cpts = blocksize*Cnodes + local dof pairs aggregate a's dofs
        # with coarse columns a*blocksize..a*blocksize+bs-1 in order) —
        # required for blocked problems, where every root dof row of T
        # stores all `blocksize` aggregate columns and "first stored
        # column" would alias the whole root node onto one coarse dof,
        # making P_I^T T singular.
        P_I = sp.coo_matrix(
            (np.ones(n_coarse), (Cpts, np.arange(n_coarse))),
            shape=(n_fine, n_coarse)).tocsr()
    else:
        # degenerate fallback (empty aggregates dropped): map each root
        # dof to the first coarse column its T row stores
        Tcsr = T.tocsr()
        has_entry = np.diff(Tcsr.indptr) > 0
        first_col = np.zeros(n_fine, dtype=np.int64)
        first_col[has_entry] = Tcsr.indices[Tcsr.indptr[:-1][has_entry]]
        sel = Cpts[has_entry[Cpts]]
        P_I = sp.coo_matrix(
            (np.ones(sel.size), (sel, first_col[sel])),
            shape=(n_fine, n_coarse)).tocsr()

    def diag_mask(idx):
        d = np.zeros(n_fine)
        d[idx] = 1.0
        return sp.dia_matrix((d[None, :], [0]), shape=(n_fine, n_fine)).tocsr()

    return {
        "Cpts": Cpts, "Fpts": Fpts, "P_I": P_I,
        "I_F": diag_mask(Fpts), "I_C": diag_mask(Cpts),
    }


# ---------------------------------------------------------------------------
# Reference-surface compatibility utilities (pyamg/util/utils.py): small
# helpers a reference user expects to find under the same names.

def blocksize(A):
    """Block size of a BSR matrix (1 for anything else)
    (reference util/utils.py:35)."""
    return A.blocksize[0] if sp.issparse(A) and A.format == "bsr" else 1


def to_type(upcast_type, varlist):
    """Convert every element of ``varlist`` (arrays, sparse matrices or
    scalars) to ``upcast_type`` in place and return it
    (reference util/utils.py ``to_type``)."""
    for i, v in enumerate(varlist):
        if np.isscalar(v):
            varlist[i] = np.array([v], dtype=upcast_type)[0]
        elif hasattr(v, "astype"):
            varlist[i] = v.astype(upcast_type)
    return varlist


def type_prep(upcast_type, varlist):
    """Like :func:`to_type`, but scalars become length-1 arrays — C/device
    kernels take arrays, not python complex scalars
    (reference util/utils.py ``type_prep``)."""
    for i, v in enumerate(varlist):
        if np.isscalar(v):
            varlist[i] = np.array([v], dtype=upcast_type)
        elif hasattr(v, "astype"):
            varlist[i] = v.astype(upcast_type)
    return varlist


def symmetric_rescaling_sa(A, B, BH=None):
    """Symmetrically rescale ``A`` by its diagonal and scale the candidate
    blocks ``B`` (and ``BH``) consistently: returns ``[D^-1/2 A D^-1/2,
    D^1/2 B, D^1/2 BH]`` (reference util/utils.py:356)."""
    D_sqrt, _D_sqrt_inv, A = symmetric_rescaling(A, copy=True)
    B = np.asarray(B) * np.asarray(D_sqrt).reshape(-1, 1)
    if BH is not None:
        BH = np.asarray(BH) * np.asarray(D_sqrt).reshape(-1, 1)
    return [A, B, BH]


def print_table(table, title='', delim='|', centering='center',
                col_padding=2, header=True, headerchar='-'):
    """Format a list of row-lists as an ASCII table string
    (reference util/utils.py:792)."""
    rows = [["" if c is None else str(c) for c in row] for row in table]
    ncols = max(len(r) for r in rows) if rows else 0
    rows = [r + [""] * (ncols - len(r)) for r in rows]
    widths = [max(len(r[j]) for r in rows) + col_padding
              for j in range(ncols)]
    just = {"center": str.center, "left": str.ljust,
            "right": str.rjust}.get(centering, str.center)
    lines = []
    total = sum(widths) + len(delim) * (ncols - 1)
    if title:
        lines.append("")
        lines.append(title.center(total))
    for i, r in enumerate(rows):
        lines.append(delim.join(just(c, w) for c, w in zip(r, widths)))
        if i == 0 and header:
            lines.append(headerchar * max(total, 1))
    return "\n".join(lines) + "\n"


def Coord2RBM(numNodes, numPDEs, x, y, z):
    """Reference-signature rigid-body-mode builder
    (reference util/utils.py:1009): ``numPDEs`` in {1, 3, 6}; returns a
    ``(numNodes*numPDEs, 1 | 6)`` array of near-nullspace modes — per node
    ``[I Q; 0 I]`` with ``Q`` the infinitesimal-rotation block from the
    3D coordinates.  (The natural-coordinates variant is
    :func:`coord2rbm`.)"""
    if numPDEs == 1:
        return np.ones((int(numNodes), 1))
    if numPDEs not in (3, 6):
        raise ValueError("Coord2RBM supports numPDEs in (1, 3, 6), got "
                         f"{numPDEs}")
    x, y, z = (np.asarray(v, dtype=float).ravel() for v in (x, y, z))
    if not (x.size == y.size == z.size == numNodes):
        raise ValueError("coordinate vectors must have length numNodes")
    rbm = np.zeros((numNodes, numPDEs, 6))
    rbm[:, :3, :3] = np.eye(3)
    rbm[:, 0, 4] = z
    rbm[:, 0, 5] = -y
    rbm[:, 1, 3] = -z
    rbm[:, 1, 5] = x
    rbm[:, 2, 3] = y
    rbm[:, 2, 4] = -x
    if numPDEs == 6:
        rbm[:, 3:, 3:] = np.eye(3)
    return rbm.reshape(numNodes * numPDEs, 6)


# reference-name aliases
UnAmal = unamal

from .profiling import hierarchy_spectrum  # noqa: E402  (reference exports
#     it from util.utils; the implementation lives with the profiling tools)
