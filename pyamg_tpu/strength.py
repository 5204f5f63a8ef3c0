"""Strength-of-connection measures.

Reference parity: pyamg/strength.py — classical (:122), symmetric (:213),
energy-based (:319), evolution (:471), distance (:34), affinity (:851) and
algebraic (:907) measures, with the distance-filter post-processing of
amg_core/evolution_strength.h:61,136.

All measures run host-side during the (staged) setup phase; the evolution
measure's per-row constrained least-squares (evolution_strength.h:316) is
reformulated as a *batched padded* solve — one `numpy` einsum/batched-pinv
over all rows at once — the same formulation the device path uses.
"""

from __future__ import annotations

import warnings

import numpy as np
import scipy.sparse as sparse

from .util.utils import (amalgamate, scale_rows, row_reduce,
                         scale_rows_by_largest_entry, to_csr, get_block_diag)
from .util.linalg import approximate_spectral_radius

__all__ = [
    "classical_strength_of_connection", "symmetric_strength_of_connection",
    "evolution_strength_of_connection", "energy_based_strength_of_connection",
    "distance_strength_of_connection", "affinity_distance",
    "algebraic_distance", "relaxation_vectors", "apply_distance_filter",
    "apply_absolute_distance_filter", "ode_strength_of_connection",
]


# ---------------------------------------------------------------------------
# distance filters (≙ evolution_strength.h:61,136)
# ---------------------------------------------------------------------------

def apply_distance_filter(C, epsilon):
    """Keep off-diagonal distances S_ij < epsilon * min_k S_ik; diagonal set
    to 1.  Modifies and returns a copy."""
    C = C.tocsr().copy()
    n = C.shape[0]
    if not np.iscomplexobj(C.data):
        from .amg_core import distance_filter_native

        if distance_filter_native(C, epsilon):
            C.eliminate_zeros()
            return C
    rows = np.repeat(np.arange(n), np.diff(C.indptr))
    offdiag = rows != C.indices
    vals = np.where(offdiag, C.data.real, np.inf)
    dmin = row_reduce(vals, C.indptr, np.minimum, np.inf)
    thresh = epsilon * dmin
    keep = offdiag & (C.data.real < thresh[rows])
    C.data = np.where(keep, C.data, 0)
    C.data = np.where(~offdiag, 1.0, C.data)
    C.eliminate_zeros()
    return C


def apply_absolute_distance_filter(C, theta):
    """Keep off-diagonal distances < theta (absolute); diagonal to 1."""
    C = C.tocsr().copy()
    n = C.shape[0]
    rows = np.repeat(np.arange(n), np.diff(C.indptr))
    offdiag = rows != C.indices
    keep = offdiag & (C.data.real < theta)
    C.data = np.where(keep, C.data, 0)
    C.data = np.where(~offdiag, 1.0, C.data)
    C.eliminate_zeros()
    return C


# ---------------------------------------------------------------------------
# classical / symmetric
# ---------------------------------------------------------------------------

def classical_strength_of_connection(A, theta=0.0):
    """|A_ij| >= theta * max_{k != i} |A_ik| (≙ ruge_stuben.h:46).

    Returns CSR S with |A| values on the kept pattern (diagonal included),
    rows scaled so the largest entry is 1.

    Examples
    --------
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.strength import classical_strength_of_connection
    >>> A = poisson((4, 4), format='csr')
    >>> S = classical_strength_of_connection(A, theta=0.25)
    >>> S.shape == A.shape and S.nnz == A.nnz
    True
    """
    if sparse.issparse(A) and A.format == "bsr":
        blocksize = A.blocksize[0]
    else:
        blocksize = 1
    A = to_csr(A)
    if theta < 0 or theta > 1:
        raise ValueError("expected theta in [0,1]")

    if blocksize == 1:
        from .amg_core import classical_strength_native

        A.sort_indices()
        S = classical_strength_native(A, theta)
        if S is not None:
            return S

    n = A.shape[0]
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    offdiag = rows != A.indices
    mags = np.abs(A.data) * offdiag
    rowmax = row_reduce(mags, A.indptr, np.maximum, 0.0)
    keep = (~offdiag) | (np.abs(A.data) >= theta * rowmax[rows])
    S = A.copy()
    S.data = np.where(keep, A.data, 0)
    S.eliminate_zeros()

    if blocksize > 1:
        S = amalgamate(S, blocksize)
    S.data = np.abs(S.data)
    return scale_rows_by_largest_entry(S)


def symmetric_strength_of_connection(A, theta=0):
    """|A_ij| >= theta * sqrt(|A_ii| |A_jj|) (≙ smoothed_aggregation.h:49).

    For BSR input, strength between supernodes uses block Frobenius norms.

    Examples
    --------
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.strength import symmetric_strength_of_connection
    >>> A = poisson((4, 4), format='csr')
    >>> S = symmetric_strength_of_connection(A, theta=0.0)
    >>> S.nnz == A.nnz
    True
    """
    if theta < 0:
        raise ValueError("expected a positive theta")

    if sparse.issparse(A) and A.format == "bsr":
        bs = A.blocksize[0]
        if bs == 1:
            A = A.tocsr()
        else:
            # block Frobenius-norm amalgamation, then the scalar measure
            nb = A.shape[0] // bs
            norms = np.sqrt((np.abs(A.data) ** 2).sum(axis=(1, 2)))
            A = sparse.csr_matrix((norms, A.indices.copy(), A.indptr.copy()),
                                  shape=(nb, nb))
    A = to_csr(A)
    n = A.shape[0]
    d = np.abs(A.diagonal())
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    thresh = theta * np.sqrt(d[rows] * d[A.indices])
    keep = (rows == A.indices) | (np.abs(A.data) >= thresh)
    S = A.copy()
    S.data = np.where(keep, A.data, 0)
    S.eliminate_zeros()
    S.data = np.abs(S.data)
    return scale_rows_by_largest_entry(S)


# ---------------------------------------------------------------------------
# distance-based (coordinates)
# ---------------------------------------------------------------------------

def distance_strength_of_connection(A, V, theta=2.0, relative_drop=True):
    """Euclidean-distance strength on the pattern of A
    (reference strength.py:34)."""
    if sparse.issparse(A) and A.format == "bsr":
        sn = A.shape[0] // A.blocksize[0]
        u = np.ones((A.data.shape[0],))
        A = sparse.csr_matrix((u, A.indices, A.indptr), shape=(sn, sn))
    A = to_csr(A)
    V = np.asarray(V)

    rows = np.repeat(np.arange(A.shape[0]), np.diff(A.indptr))
    cols = A.indices
    C = np.sqrt(((V[rows] - V[cols]) ** 2).sum(axis=1))
    C[C < 1e-6] = 1e-6
    C = sparse.csr_matrix((C, A.indices.copy(), A.indptr.copy()),
                          shape=A.shape)
    if relative_drop:
        if theta != np.inf:
            C = apply_distance_filter(C, theta)
    else:
        C = apply_absolute_distance_filter(C, theta)
    C = C + sparse.eye(C.shape[0], C.shape[1], format="csr")
    C.data = 1.0 / C.data
    return scale_rows_by_largest_entry(C)


# ---------------------------------------------------------------------------
# evolution measure (Olson, Schroder, Tuminaro 2008)
# ---------------------------------------------------------------------------

def _masked_power(Atilde_T, nsquare, mask):
    """(Atilde^T)^(2^nsquare) with the final product restricted to the mask
    pattern (≙ incomplete_mat_mult_csr, evolution_strength.h:676).

    The last squaring uses the native masked SpGEMM when available (only the
    pattern entries are computed); otherwise full-product-then-mask."""
    from .amg_core import masked_spgemm_native

    M = Atilde_T
    for _ in range(max(nsquare - 1, 0)):
        M = (M @ M).tocsr()

    def ones_pattern():
        # shares mask's index arrays; never mutated (multiply allocates)
        return sparse.csr_matrix(
            (np.ones(mask.nnz), mask.indices, mask.indptr),
            shape=mask.shape)

    if nsquare > 0:
        native = masked_spgemm_native(M, M, mask)   # reads structure only
        if native is not None:
            M = native
        else:
            M = (M @ M).multiply(ones_pattern()).tocsr()
    else:
        M = M.multiply(ones_pattern()).tocsr()
    M.eliminate_zeros()
    M.sort_indices()
    return M


def evolution_strength_of_connection(A, B=None, epsilon=4.0, k=2,
                                     proj_type="l2", block_flag=False,
                                     symmetrize_measure=True,
                                     _masked_power_impl=None):
    """Evolution (ODE) strength measure (reference strength.py:471).

    Evolves delta functions by k weighted-Jacobi steps and measures how well
    the near-nullspace B locally approximates the evolved vector, via a
    constrained minimization per row (batched here).

    Examples
    --------
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.strength import evolution_strength_of_connection
    >>> A = poisson((8, 8), format='csr')
    >>> S = evolution_strength_of_connection(A, k=2, epsilon=4.0)
    >>> S.shape
    (64, 64)
    """
    if epsilon < 1.0:
        raise ValueError("expected epsilon > 1.0")
    if k <= 0:
        raise ValueError("number of time steps must be > 0")
    if proj_type not in ("l2", "D_A"):
        raise ValueError("proj_type must be 'l2' or 'D_A'")

    bsr_in = sparse.issparse(A) and A.format == "bsr"
    numPDEs = A.blocksize[0] if bsr_in else 1

    if B is None:
        Bmat = np.ones((A.shape[0], 1), dtype=A.dtype)
    else:
        Bmat = np.asarray(B).reshape(A.shape[0], -1)

    D = A.diagonal()
    Dinv = None
    Dinv_A = None
    if bsr_in and block_flag:
        Dinv_blocks = get_block_diag(A, blocksize=numPDEs, inv_flag=True)
        Dinv_mat = sparse.bsr_matrix(
            (Dinv_blocks, np.arange(Dinv_blocks.shape[0]),
             np.arange(Dinv_blocks.shape[0] + 1)), shape=A.shape)
        Dinv_A = (Dinv_mat @ A).tocsr()
    else:
        Dinv = np.zeros_like(D)
        mask_nz = D != 0
        Dinv[mask_nz] = 1.0 / D[mask_nz]
        Dinv[~mask_nz] = 1.0
        # Dinv_A itself (an O(nnz) scaled copy) is built lazily: the
        # probe-verified symmetric path below never materializes it
    A = to_csr(A)
    # eliminate_zeros unconditionally prunes (two O(nnz) copies); scan
    # first — RAP-produced level operators are already zero-free
    if A.nnz and not A.data.all():
        A.eliminate_zeros()
    A.sort_indices()

    def _get_Dinv_A():
        return (Dinv_A if Dinv_A is not None
                else scale_rows(A, Dinv, copy=True))

    dimen = A.shape[1]
    NullDim = Bmat.shape[1]

    # the Jacobi damping only needs rho to ~1%.  For (probe-verified)
    # symmetric A with positive diagonal, rho(D^{-1}A) equals
    # rho(D^{-1/2} A D^{-1/2}) — a SYMMETRIC operator, so the Lanczos
    # 3-term recurrence replaces restarted Arnoldi (~5x cheaper: no
    # Gram-Schmidt, 15 matvecs total).  The probe costs two matvecs
    # (A.T of a CSR is a free CSC view in scipy).
    rho_DinvA = None
    sym_probe_rel = np.inf
    if (not np.iscomplexobj(A.data) and numPDEs == 1
            and A.shape[0] == A.shape[1] and (D > 0).all()):
        xp = np.random.default_rng(1).standard_normal(A.shape[0])
        y1 = A @ xp
        y2 = A.T @ xp
        scale = float(np.abs(y1).max()) or 1.0
        sym_probe_rel = float(np.abs(y1 - y2).max()) / scale
        if sym_probe_rel <= 1e-8:
            from scipy.sparse.linalg import LinearOperator

            from .util.linalg import _rho_lanczos

            # matrix-free scaled operator: one f32 data view of A (index
            # arrays shared) + two O(n) scalings per Lanczos step — no
            # O(nnz) scaled-matrix materialization
            s = (1.0 / np.sqrt(D)).astype(np.float32)
            A32 = sparse.csr_matrix(
                (A.data.astype(np.float32), A.indices, A.indptr),
                shape=A.shape)
            op = LinearOperator(A.shape, dtype=np.float32,
                                matvec=lambda z: s * (A32 @ (s * z)))
            rho_DinvA = _rho_lanczos(op)
    if rho_DinvA is None:
        # estimate on an f32 twin (2x cheaper host matvecs); the evolution
        # products stay in A's dtype
        Dinv_A = _get_Dinv_A()
        rho_op = Dinv_A.astype(np.float32) if Dinv_A.dtype == np.float64 \
            else Dinv_A
        rho_DinvA = approximate_spectral_radius(rho_op)

    if proj_type == "D_A":
        D_A_diag = np.asarray(D)
    else:
        D_A_diag = np.ones(dimen, dtype=A.dtype)

    nsquare = int(np.log2(k))
    ninc = k - 2**nsquare

    # (I - c*D^{-1}A)^T.  For probe-verified (bitwise-level) symmetric A
    # this equals I - c*A*D^{-1}, built in ONE value pass over A's own CSR
    # arrays (identity_minus_colscaled) — no CSC conversion, no scaled
    # copy: the two O(nnz) passes dominated the host evolution setup at
    # 1M rows.  The association inside the kernel matches the transpose
    # path bit-for-bit, so hierarchies are unchanged for exactly
    # symmetric (stencil) operators.  Otherwise: built from Dinv_A's CSC
    # arrays (the CSC of a matrix IS the CSR of its transpose) with the
    # identity folded into the stored diagonal.
    from .amg_core import (identity_minus_colscaled_native,
                           identity_minus_scaled_native)

    Atilde = None
    W = None
    # bitwise gate (probe products EXACTLY equal): a matrix symmetric only
    # to ~1e-13 would pass a tolerance gate yet differ from the transpose
    # path at the last ulp, and SOC feeds discontinuous threshold/splitting
    # decisions — near-symmetric inputs must take the transpose path below
    if sym_probe_rel == 0.0 and Dinv is not None:
        Sx = identity_minus_colscaled_native(A, Dinv, 1.0 / rho_DinvA)
        if Sx is not None:
            Atilde = sparse.csr_matrix((Sx, A.indices, A.indptr),
                                       shape=(dimen, dimen))
    if Atilde is None:
        Dinv_A = _get_Dinv_A()
        W = Dinv_A.tocsc()
        W.sort_indices()
        Sx = identity_minus_scaled_native(W, 1.0 / rho_DinvA)
        if Sx is not None:
            Atilde = sparse.csr_matrix((Sx, W.indices, W.indptr),
                                       shape=(dimen, dimen))
    if Atilde is None:
        Atilde = sparse.csr_matrix(
            ((-1.0 / rho_DinvA) * W.data, W.indices, W.indptr),
            shape=(dimen, dimen))
        rows_t = np.repeat(np.arange(dimen), np.diff(Atilde.indptr))
        dmask_t = rows_t == Atilde.indices
        if int(dmask_t.sum()) == dimen:
            Atilde.data[dmask_t] += 1.0
        else:
            Atilde = (sparse.eye(dimen, dimen, format="csr",
                                 dtype=A.dtype) + Atilde).tocsr()

    # mask = pattern of A restricted to same-PDE couplings
    mask = A
    if numPDEs > 1:
        mask = A.copy()
        row_length = np.diff(mask.indptr)
        my_pde = np.mod(np.arange(dimen), numPDEs)
        my_pde = np.repeat(my_pde, row_length)
        mask.data[np.mod(mask.indices, numPDEs) != my_pde] = 0.0
        mask.eliminate_zeros()

    if ninc > 0:
        warnings.warn("evolution strength is most efficient for k a power "
                      f"of two; got k={k}")
        step = Atilde
        for _ in range(nsquare):
            Atilde = (Atilde @ Atilde).tocsr()
        for _ in range(ninc):
            Atilde = (Atilde @ step).tocsr()
        pattern = sparse.csr_matrix(
            (np.ones(mask.nnz), mask.indices, mask.indptr), shape=mask.shape)
        Atilde = Atilde.multiply(pattern).tocsr()
        Atilde.eliminate_zeros()
        Atilde.sort_indices()
    else:
        # _masked_power_impl: injection point for the distributed setup —
        # the masked-SpGEMM chain (the dominant evolution-SOC flops) runs
        # as pattern-masked device products over a mesh
        # (parallel/classical_setup.py) instead of the host kernel
        Atilde = (_masked_power_impl or _masked_power)(Atilde, nsquare, mask)

    if NullDim == 1:
        # One candidate vector: the constrained fit is closed-form.  With a
        # single column b, the row-i interpolation constraint pins the fit
        # coefficient to z_i / b_i, so the fitted value at column j is
        # zhat_j = b_j * z_i / b_i and the connection quality is the
        # relative misfit |1 - zhat_j / z_j| on every stored entry.
        b1 = np.ravel(Bmat).copy()
        b1[b1 == 0] = 1.0
        from .amg_core import evolution_nulldim1_native

        tiny = np.sqrt(np.finfo(float).eps)
        Atilde.sort_indices()
        if not np.iscomplexobj(b1) and \
                evolution_nulldim1_native(Atilde, b1, tiny):
            Atilde.eliminate_zeros()
            return _evolution_epilogue(Atilde, epsilon, symmetrize_measure,
                                       bsr_in, numPDEs)
        coeff = Atilde.diagonal() / b1                # z_i / b_i, per row
        row_of = np.repeat(np.arange(dimen), np.diff(Atilde.indptr))
        z = Atilde.data
        zhat = coeff[row_of] * b1[Atilde.indices]
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = zhat / z
        misfit = np.abs(1.0 - ratio)
        # a fit pointing against the evolved value, or vanishingly small
        # relative to it, marks the connection as weak (dropped outright)
        aligned = (zhat.real * z.real + zhat.imag * z.imag) >= 0.0
        significant = np.abs(ratio) >= 1e-4
        Atilde.data = np.where(aligned & significant, misfit, 0.0)
        Atilde.eliminate_zeros()
        # near-exact fits: clamp to a small positive distance so the final
        # 1/distance inversion stays finite
        tiny = np.sqrt(np.finfo(float).eps)
        Atilde.data[Atilde.data < tiny] = 1e-4
    else:
        Atilde = _evolution_constrained_min(Atilde, Bmat, D_A_diag)

    return _evolution_epilogue(Atilde, epsilon, symmetrize_measure,
                               bsr_in, numPDEs)


def _evolution_epilogue(Atilde, epsilon, symmetrize_measure, bsr_in=False,
                        numPDEs=1):
    """Distance filter → symmetrize → unit diagonal → (BSR amalgamation) →
    invert distances to strengths — the tail shared by the native and numpy
    evolution paths."""
    dimen = Atilde.shape[1]
    Atilde.data = np.asarray(np.real(Atilde.data), dtype=float)

    if not bsr_in:
        # fused native tail: filter + symmetrize + diag + invert + scale in
        # one call (five scipy/numpy passes and two format conversions saved)
        from .amg_core import evolution_epilogue_native

        Atilde.sort_indices()
        native = evolution_epilogue_native(Atilde, epsilon,
                                           symmetrize_measure)
        if native is not None:
            return native

    if epsilon != np.inf:
        Atilde = apply_distance_filter(Atilde, epsilon)

    if symmetrize_measure:
        Atilde = (0.5 * (Atilde + Atilde.T)).tocsr()

    # diagonal to 1.0
    rows_d = np.repeat(np.arange(dimen), np.diff(Atilde.indptr))
    isdiag = rows_d == Atilde.indices
    if int(isdiag.sum()) == dimen:
        Atilde.data[isdiag] = 1.0         # every row stores its diagonal
    else:
        Ieye = sparse.eye(dimen, dimen, format="csr")
        Ieye = Ieye - sparse.dia_matrix((Atilde.diagonal()[None, :], [0]),
                                        shape=Atilde.shape)
        Atilde = (Atilde + Ieye).tocsr()

    if bsr_in:
        Ab = Atilde.tobsr(blocksize=(numPDEs, numPDEs))
        # block min of nonzeros (≙ min_blocks, evolution_strength.h:213)
        absd = np.abs(Ab.data.reshape(Ab.data.shape[0], -1))
        absd_masked = np.where(absd > 0, absd, np.inf)
        mins = absd_masked.min(axis=1)
        mins[~np.isfinite(mins)] = 0.0
        Atilde = sparse.csr_matrix(
            (mins, Ab.indices, Ab.indptr),
            shape=(Ab.shape[0] // numPDEs, Ab.shape[1] // numPDEs))
        Atilde.eliminate_zeros()

    with np.errstate(divide="ignore"):
        Atilde.data = 1.0 / Atilde.data
    return scale_rows_by_largest_entry(Atilde.tocsr())


def _evolution_constrained_min(Atilde, B, D_A_diag):
    """Batched version of evolution_strength_helper
    (evolution_strength.h:316): per-row constrained minimization
    min ||z - B x||_{D_A}  s.t. (B x)_i = z_i, strength = |1 - zhat_j/z_j|.
    """
    Atilde = Atilde.tocsr()
    Atilde.sort_indices()
    n = Atilde.shape[0]
    K = B.shape[1]
    nnz_row = np.diff(Atilde.indptr)
    L = int(nnz_row.max()) if n else 0

    eps_map = {np.dtype(np.float32): 1e3 * np.finfo(np.float32).eps,
               np.dtype(np.complex64): 1e3 * np.finfo(np.float32).eps,
               np.dtype(np.float64): 1e6 * np.finfo(np.float64).eps,
               np.dtype(np.complex128): 1e6 * np.finfo(np.float64).eps}
    tol = eps_map.get(np.dtype(Atilde.dtype), 1e6 * np.finfo(float).eps)

    rows = np.repeat(np.arange(n), nnz_row)
    offs = np.arange(Atilde.nnz) - np.repeat(Atilde.indptr[:-1], nnz_row)

    # pad to (n, L)
    z = np.zeros((n, L), dtype=Atilde.dtype)
    cols = np.zeros((n, L), dtype=np.int64)
    valid = np.zeros((n, L), dtype=bool)
    z[rows, offs] = Atilde.data
    cols[rows, offs] = Atilde.indices
    valid[rows, offs] = True

    Bp = B[cols] * valid[:, :, None]                      # (n, L, K)
    Dp = D_A_diag[cols] * valid                           # (n, L)

    # LHS blocks: [[2 B^H D B, (B^H D e_i)], [e_i^T B, 0]]
    BhDB = 2.0 * np.einsum("nlk,nl,nlm->nkm", Bp.conj(), Dp, Bp)
    Bi_row = B.conj() * D_A_diag[:, None]                 # D_A * conj(B) at i
    LHS = np.zeros((n, K + 1, K + 1), dtype=np.result_type(B.dtype,
                                                           Atilde.dtype))
    LHS[:, :K, :K] = BhDB
    LHS[:, :K, K] = Bi_row.conj()      # B^H D_A e_i  (column)
    LHS[:, K, :K] = B                  # e_i^T B      (row)

    RHS = np.zeros((n, K + 1), dtype=LHS.dtype)
    RHS[:, :K] = 2.0 * np.einsum("nlk,nl,nl->nk", Bp.conj(), Dp, z)
    # z at i (diagonal entry), default 1.0 when diag not present
    diag_entry = np.where(
        (cols == np.arange(n)[:, None]) & valid, z, 0).sum(axis=1)
    has_diag = ((cols == np.arange(n)[:, None]) & valid).any(axis=1)
    RHS[:, K] = np.where(has_diag, diag_entry, 1.0)

    # pseudo-inverse solve per row
    from .util.linalg import pinv_array

    x = np.einsum("nij,nj->ni", pinv_array(LHS), RHS)[:, :K]
    zhat = np.einsum("nlk,nk->nl", Bp, x)

    # filter numerically-zero parts of zhat
    max_zhat = np.abs(zhat).max(axis=1, keepdims=True)
    tol_i = tol * max_zhat
    re = np.where(np.abs(zhat.real) < tol_i, 0.0, zhat.real)
    if np.iscomplexobj(zhat):
        im = np.where(np.abs(zhat.imag) < tol_i, 0.0, zhat.imag)
        zhat = re + 1j * im
    else:
        zhat = re

    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(z != 0, zhat / np.where(z != 0, z, 1), 0.0)
    dprod = zhat.real * z.real + zhat.imag * z.imag
    err = np.abs(1.0 - ratio)
    sqrt_eps = np.sqrt(np.finfo(float).eps)
    val = np.where(err < sqrt_eps, 1e-4, err)
    val = np.where(np.abs(ratio) ** 2 <= 1e-8, 0.0, val)
    val = np.where(dprod < 0.0, 0.0, val)
    # diagonal strongly connected to itself
    val = np.where(cols == np.arange(n)[:, None], 1.0, val)
    # rows with length <= K: all connections strong
    val = np.where((nnz_row[:, None] <= K), 1.0, val)

    out = Atilde.copy()
    out.data = val[rows, offs].astype(out.dtype)
    out.eliminate_zeros()
    return out


# ---------------------------------------------------------------------------
# energy-based measure
# ---------------------------------------------------------------------------

def energy_based_strength_of_connection(A, theta=0.0, k=2):
    """Energy-based measure after Brannick et al. 2006
    (reference strength.py:319): relax columns of the identity to approximate
    A^{-1}, then measure the A-norm energy change from zeroing each entry."""
    if theta < 0:
        raise ValueError("expected a positive theta")
    if k < 0 or not isinstance(k, int):
        raise ValueError("expected positive integer k")

    bsr_flag = sparse.issparse(A) and A.format == "bsr"
    numPDEs = A.blocksize[0] if bsr_flag else 1

    A = to_csr(A)
    Atilde = A.copy()
    Acsc = A.tocsc()

    D = A.diagonal()
    Dinv = np.where(D != 0, 1.0 / np.where(D != 0, D, 1), 0.0)
    Dinv_mat = sparse.dia_matrix((Dinv[None, :], [0]), shape=A.shape).tocsc()
    omega = 1.0 / approximate_spectral_radius(Dinv_mat @ Acsc)

    # S ≈ A^{-1} by k+1 steps of weighted Jacobi from S=0
    S = sparse.csc_matrix(A.shape, dtype=A.dtype)
    I = sparse.eye(A.shape[0], format="csc")
    for _ in range(k + 1):
        S = S + omega * (Dinv_mat @ (I - Acsc @ S))
    S = S.tocsc()

    for i in range(Atilde.shape[0]):
        v = np.asarray(S[:, i].todense()).ravel().copy()
        Av = Acsc @ v
        denom = np.sqrt(np.abs(np.vdot(v, Av)))
        if denom == 0:
            denom = 1.0
        for jj in range(Atilde.indptr[i], Atilde.indptr[i + 1]):
            col = Atilde.indices[jj]
            vj = v[col]
            v[col] = 0.0
            num = np.sqrt(np.abs(np.vdot(v, Acsc @ v)))
            val = num / denom - 1.0
            Atilde.data[jj] = abs(val) if val > -0.01 else 0.0
            v[col] = vj

    Atilde = classical_strength_of_connection(Atilde, theta=theta)
    Atilde.eliminate_zeros()
    Atilde = (Atilde + sparse.eye(A.shape[0], format="csr")).tocsr()
    Atilde.sort_indices()

    if bsr_flag:
        Ab = Atilde.tobsr(blocksize=(numPDEs, numPDEs))
        uone = np.ones((Ab.indices.shape[0],))
        Atilde = sparse.csr_matrix((uone, Ab.indices, Ab.indptr),
                                   shape=(Ab.shape[0] // numPDEs,
                                          Ab.shape[1] // numPDEs))
    return scale_rows_by_largest_entry(Atilde)


# ---------------------------------------------------------------------------
# relaxation-vector distances (LAMG affinity / algebraic distance)
# ---------------------------------------------------------------------------

def relaxation_vectors(A, R, k, alpha, seed=None):
    """R random vectors relaxed k times on A x = 0 with weighted Jacobi
    (reference strength.py:818)."""
    from .relaxation.relaxation import jacobi

    n = A.shape[0]
    rng = np.random.default_rng(seed)
    x = rng.random((n, R)) - 0.5
    b = np.zeros(n)
    for r in range(R):
        xr = x[:, r].copy()
        jacobi(A, xr, b, iterations=k, omega=alpha)
        x[:, r] = xr
    return x


def _distance_measure_common(A, func, alpha, R, k, epsilon, seed=None):
    x = relaxation_vectors(A, R, k, alpha, seed=seed)
    rows, cols = A.nonzero()
    d = func(x, rows, cols)
    d = np.asarray(d, dtype=float)
    d[rows == cols] = 0
    C = sparse.csr_matrix((d, (rows, cols)), shape=A.shape)
    C.eliminate_zeros()
    C = apply_distance_filter(C, epsilon)
    C.eliminate_zeros()
    with np.errstate(divide="ignore"):
        C.data = 1.0 / C.data
    C = (C + sparse.eye(C.shape[0], format="csr")).tocsr()
    return scale_rows_by_largest_entry(C)


def affinity_distance(A, alpha=0.5, R=5, k=20, epsilon=4.0, seed=None):
    """LAMG affinity measure (Livne & Brandt; reference strength.py:851)."""
    A = to_csr(A)
    _check_distance_args(alpha, R, k, epsilon)

    def distance(x, rows, cols):
        num = np.sum(x[rows] * x[cols], axis=1) ** 2
        den = np.sum(x[rows] ** 2, axis=1) * np.sum(x[cols] ** 2, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            return 1 - num / den

    return _distance_measure_common(A, distance, alpha, R, k, epsilon, seed)


def algebraic_distance(A, alpha=0.5, R=5, k=20, epsilon=2.0, p=2, seed=None):
    """Algebraic distance (Safro, Sanders & Schulz;
    reference strength.py:907)."""
    A = to_csr(A)
    _check_distance_args(alpha, R, k, epsilon)
    if p < 1:
        raise ValueError("expected p>=1 or numpy.inf")

    def distance(x, rows, cols):
        if p != np.inf:
            return (np.sum(np.abs(x[rows] - x[cols]) ** p, axis=1) / R) \
                ** (1.0 / p)
        return np.abs(x[rows] - x[cols]).max(axis=1)

    return _distance_measure_common(A, distance, alpha, R, k, epsilon, seed)


def _check_distance_args(alpha, R, k, epsilon):
    if alpha < 0:
        raise ValueError("expected alpha>0")
    if R <= 0 or not isinstance(R, int):
        raise ValueError("expected integer R>0")
    if k <= 0 or not isinstance(k, int):
        raise ValueError("expected integer k>0")
    if epsilon < 1:
        raise ValueError("expected epsilon>1.0")


def ode_strength_of_connection(*args, **kwargs):
    """Deprecated alias of evolution_strength_of_connection."""
    warnings.warn("ode_strength_of_connection is deprecated; use "
                  "evolution_strength_of_connection", DeprecationWarning)
    return evolution_strength_of_connection(*args, **kwargs)
