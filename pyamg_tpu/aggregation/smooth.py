"""Prolongation smoothers: Jacobi, Richardson, energy minimization.

Reference parity: pyamg/aggregation/smooth.py
(``jacobi_prolongation_smoother`` :67, ``richardson_prolongation_smoother``
:211, ``energy_prolongation_smoother`` :904 with ``Satisfy_Constraints`` :21
and the cg/cgnr/gmres minimization drivers :283,:460,:669).

``Satisfy_Constraints`` (≙ amg_core satisfy_constraints_helper,
smoothed_aggregation.h:556) is fully vectorized over matrix entries; the
pattern-restricted products (≙ incomplete_mat_mult_bsr,
smoothed_aggregation.h:797) are formed as product-then-mask on host during
the staged setup.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..util.utils import (get_diagonal, get_block_diag, to_csr, unamal,
                          compute_BtBinv, scale_rows, filter_matrix_rows,
                          truncate_rows)
from ..util.linalg import approximate_spectral_radius

__all__ = ["jacobi_prolongation_smoother", "richardson_prolongation_smoother",
           "energy_prolongation_smoother", "satisfy_constraints"]


def _jacobi_weight(S, omega, weighting, sym_hint):
    """Shared (D_inv, c) for diagonal/local jacobi weighting: c scales
    D^{-1} S so that S_jac = I - c D^{-1} S.  Single source of truth for
    both the fused one-product path (_jacobi_operator) and the materialized
    path (_dinv_s) — the rho estimator choice must never diverge between
    them."""
    if weighting == "diagonal":
        D_inv = get_diagonal(S, inv=True)
        if sym_hint:
            from ..relaxation.smoothing import rho_D_inv_A

            rho = rho_D_inv_A(S, symmetric=True)
        else:
            rho = approximate_spectral_radius(
                scale_rows(to_csr(S), D_inv, copy=True))
        return D_inv, omega / rho
    # "local": no rho — omega applied directly to the abs-row-sum scaling
    D = np.asarray(abs(to_csr(S)).sum(axis=1)).ravel()
    D_inv = np.where(D != 0, 1.0 / np.where(D != 0, D, 1), 0.0)
    return D_inv, omega


def _dinv_s(S, omega, weighting, sym_hint=None):
    """omega-scaled D^{-1} S for the requested weighting.

    ``sym_hint``: caller-supplied Hermitian hint — rho(D^{-1}S) then comes
    from the Lanczos similarity path cached on S (rho_D_inv_A), ~5x cheaper
    than the Arnoldi estimate and shared across repeated builds on the same
    operator (adaptive SA rebuilds)."""
    if weighting == "block" and (not sp.issparse(S) or S.format != "bsr"
                                 or S.blocksize[0] == 1):
        weighting = "diagonal"

    if weighting == "diagonal":
        D_inv, c = _jacobi_weight(S, omega, "diagonal", sym_hint)
        D_inv_S = c * scale_rows(to_csr(S), D_inv, copy=True)
    elif weighting == "block":
        D_inv = get_block_diag(S, blocksize=S.blocksize[0], inv_flag=True)
        D_inv_mat = sp.bsr_matrix(
            (D_inv, np.arange(D_inv.shape[0]),
             np.arange(D_inv.shape[0] + 1)), shape=S.shape)
        D_inv_S = (D_inv_mat @ S).tocsr()
        D_inv_S = (omega / approximate_spectral_radius(D_inv_S)) * D_inv_S
    elif weighting == "local":
        D_inv, c = _jacobi_weight(S, omega, "local", sym_hint)
        D_inv_S = c * scale_rows(to_csr(S), D_inv, copy=True)
    else:
        raise ValueError("incorrect weighting option")
    return D_inv_S


def _jacobi_operator(S, omega, weighting, sym_hint):
    """E = I - (omega/rho) D^{-1} S built in ONE value pass on S's own
    pattern (requires every row to store its diagonal; returns None
    otherwise).  Replaces scale_rows copy + scalar-mul copy + the sparse
    subtract ``P - D_inv_S @ P`` with a single product ``E @ P`` — the
    symbolic merge of the subtract was half the jacobi smoothing cost on
    the adaptive-SA rebuild path."""
    if weighting not in ("diagonal", "local"):
        return None
    S_csr = to_csr(S)
    n = S_csr.shape[0]
    if S_csr.shape[1] != n:
        return None
    D_inv, c = _jacobi_weight(S, omega, weighting, sym_hint)
    rows = np.repeat(np.arange(n), np.diff(S_csr.indptr))
    diag_mask = S_csr.indices == rows
    if int(diag_mask.sum()) != n:
        return None             # rows without a stored diagonal: fallback
    data = (-c) * (S_csr.data * D_inv[rows])
    data[diag_mask] += 1.0
    E = sp.csr_matrix((data, S_csr.indices, S_csr.indptr),
                      shape=S_csr.shape)
    E.has_sorted_indices = S_csr.has_sorted_indices
    return E


def jacobi_prolongation_smoother(S, T, C, B, omega=4.0 / 3.0, degree=1,
                                 filter=False, weighting="diagonal",
                                 sym_hint=None):
    """P = (I - omega/rho(D^{-1}S) D^{-1}S)^degree T
    (reference smooth.py:67), with optional strength filtering that
    preserves T B_c via constraint satisfaction.

    Examples
    --------
    >>> import numpy as np
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.aggregation.aggregate import standard_aggregation
    >>> from pyamg_tpu.aggregation.tentative import fit_candidates
    >>> from pyamg_tpu.aggregation.smooth import (
    ...     jacobi_prolongation_smoother)
    >>> A = poisson((16, 16), format='csr')
    >>> AggOp, _ = standard_aggregation(A)
    >>> T, Bc = fit_candidates(AggOp, np.ones((A.shape[0], 1)))
    >>> P = jacobi_prolongation_smoother(A, T, A, np.ones((A.shape[0], 1)))
    >>> P.shape == T.shape and P.nnz >= T.nnz
    True
    """
    if not filter:
        E = _jacobi_operator(S, omega, weighting, sym_hint)
        if E is not None:
            P = to_csr(T)
            for _ in range(degree):
                P = (E @ P).tocsr()
            return P
    if filter:
        numPDEs = S.blocksize[0] if (sp.issparse(S) and S.format == "bsr") \
            else 1
        Cf = unamal(C, numPDEs, numPDEs)
        S = to_csr(S).multiply(Cf).tocsr()
        S.eliminate_zeros()
        sym_hint = None                  # filtered S loses exact symmetry

    D_inv_S = _dinv_s(S, omega, weighting, sym_hint=sym_hint)
    T = to_csr(T)

    if filter:
        P = T
        for _ in range(degree):
            U = (D_inv_S @ P).tocsr()
            BtBinv = compute_BtBinv(B, U)
            U = satisfy_constraints(U, B, BtBinv)
            P = (P - U).tocsr()
    else:
        P = T
        for _ in range(degree):
            P = (P - D_inv_S @ P).tocsr()
    return P


def richardson_prolongation_smoother(S, T, omega=4.0 / 3.0, degree=1,
                                     sym_hint=None):
    """P = (I - omega/rho(S) S)^degree T (reference smooth.py:211)."""
    weight = omega / approximate_spectral_radius(
        S, symmetric=bool(sym_hint) or None)
    P = to_csr(T)
    S = to_csr(S)
    for _ in range(degree):
        P = (P - weight * (S @ P)).tocsr()
    return P


def satisfy_constraints(U, B, BtBinv):
    """Project each row of U so that U @ B = 0
    (≙ satisfy_constraints_helper, smoothed_aggregation.h:556).

    U: sparse (n, m); B: (m, k) coarse candidates; BtBinv: (n, k, k)
    per-row Gram pseudo-inverses over U's sparsity pattern.
    Fully vectorized: per-entry correction
    U_ij -= (U_i B) BtBinv_i (B_j)^H.
    """
    U = to_csr(U).copy()
    B = np.asarray(B)
    n = U.shape[0]
    UB = np.asarray(U @ B)                                 # (n, k)
    coef = np.einsum("nk,nkl->nl", UB, BtBinv)             # (n, k)
    rows = np.repeat(np.arange(n), np.diff(U.indptr))
    U.data = U.data - np.einsum("ek,ek->e", coef[rows],
                                np.conj(B[U.indices]))
    return U


def _masked_product(A, P, pattern):
    """(A @ P) restricted to ``pattern``'s sparsity
    (≙ incomplete_mat_mult_bsr, smoothed_aggregation.h:797).

    Native pattern-restricted SpGEMM (two-pointer row·column merges at the
    output pattern only) — this runs once per energy-minimization iteration,
    so avoiding the full product is the difference between O(nnz(A@P)) and
    O(nnz(pattern)) work.  Falls back to product-then-mask off the native
    path (non-f64/complex dtypes)."""
    from ..amg_core import masked_spgemm_native

    out = masked_spgemm_native(to_csr(A), P, pattern)
    if out is not None:
        return out
    return (A @ P).tocsr().multiply(pattern).tocsr()


def _grow_pattern(Atilde, T, degree):
    pattern = to_csr(T).copy()
    pattern.data = np.ones_like(pattern.data)
    if degree > 0:
        G = abs(to_csr(Atilde))
        for _ in range(degree):
            pattern = (G @ pattern).tocsr()
    pattern.data = np.ones_like(pattern.data)
    return pattern


def energy_prolongation_smoother(A, T, Atilde, B, Bf=None, Cpt_params=None,
                                 krylov="cg", maxiter=4, tol=1e-8, degree=1,
                                 weighting="local", prefilter=None,
                                 postfilter=None):
    """Energy-minimizing prolongation smoothing (reference smooth.py:904).

    Minimizes trace(P^H A P) over P with sparsity restricted to
    |Atilde|^degree |T| and the constraint P @ B_c = B_f (enforced as
    U @ B_c = 0 on every update U), via pattern-constrained CG (SPD),
    CGNR or GMRES (nonsymmetric).
    """
    bs_A = A.blocksize[0] if sp.issparse(A) and A.format == "bsr" else 1

    # node-blocked fast path: the whole CG stays in BSR block form
    if (bs_A > 1 and krylov == "cg" and weighting in ("local", "diagonal")
            and not prefilter and not postfilter
            and not (Cpt_params is not None and Cpt_params[0])
            and (degree == 0
                 or (Atilde is not None and sp.issparse(Atilde)
                     and Atilde.shape[0] * bs_A == T.shape[0]))):
        Tout = _cg_prolongation_bsr(A, to_csr(T), Atilde, np.asarray(B),
                                    maxiter, tol, degree, weighting)
        if Tout is not None:
            Tout.eliminate_zeros()
            return Tout

    A = to_csr(A)
    T = to_csr(T)
    B = np.asarray(B)

    # blocked operators carry a node-level (amalgamated) strength graph;
    # expand it back to dof level for the pattern growth
    # (reference smooth.py:1062-1068 UnAmal)
    if Atilde is not None and sp.issparse(Atilde) \
            and Atilde.shape[0] != T.shape[0]:
        bs_row = T.shape[0] // Atilde.shape[0]
        Atilde = unamal(Atilde, bs_row, bs_row)

    # sparsity pattern growth (+ optional prefiltering)
    if prefilter:
        if "theta" in prefilter:
            T = filter_matrix_rows(T, prefilter["theta"])
        if "k" in prefilter:
            T = truncate_rows(T, prefilter["k"])
    pattern = _grow_pattern(Atilde, T, degree)

    # root-node handling: C-point rows of the pattern are exactly P_I's
    if Cpt_params is not None and Cpt_params[0]:
        params = Cpt_params[1]
        I_F, P_I = to_csr(params["I_F"]), to_csr(params["P_I"])
        pattern = (I_F @ pattern).tocsr()
        PIpat = P_I.copy()
        PIpat.data = np.ones_like(PIpat.data)
        pattern = (pattern + PIpat).tocsr()
        pattern.data = np.ones_like(pattern.data)

    BtBinv = compute_BtBinv(B, pattern)

    def project(U):
        if Cpt_params is not None and Cpt_params[0]:
            U = (to_csr(Cpt_params[1]["I_F"]) @ U).tocsr()
        return satisfy_constraints(U, B, BtBinv)

    # weighting operator for the preconditioned residual
    if weighting == "local":
        Dv = np.asarray(abs(A).sum(axis=1)).ravel()
        Dinv = np.where(Dv != 0, 1.0 / np.where(Dv != 0, Dv, 1), 0.0)
    elif weighting == "diagonal":
        Dinv = get_diagonal(A, inv=True)
    elif weighting == "block":
        Dinv = None     # handled below via block matrix
    else:
        raise ValueError("incorrect weighting option")
    if weighting == "block":
        Db = get_block_diag(A, blocksize=A.blocksize[0]
                            if sp.issparse(A) and A.format == "bsr" else 1,
                            inv_flag=True)
        Dinv_mat = sp.bsr_matrix((Db, np.arange(Db.shape[0]),
                                  np.arange(Db.shape[0] + 1)),
                                 shape=A.shape).tocsr()

        def apply_Dinv(R):
            return (Dinv_mat @ R).tocsr()
    else:
        def apply_Dinv(R):
            return scale_rows(R, Dinv, copy=True)

    if krylov not in ("cg", "cgnr", "gmres"):
        raise ValueError(f"unknown krylov method {krylov!r}")

    # pattern-constrained minimization
    if krylov == "cg":
        Tout = None
        if weighting in ("local", "diagonal"):
            fmask = None
            if Cpt_params is not None and Cpt_params[0]:
                fmask = np.asarray(
                    to_csr(Cpt_params[1]["I_F"]).diagonal()).real != 0
            Tout = _cg_prolongation_flat(A, T, pattern, B, BtBinv, Dinv,
                                         fmask, maxiter, tol)
        if Tout is None:
            Tout = _cg_prolongation(A, T, pattern, project, apply_Dinv,
                                    maxiter, tol)
    elif krylov == "cgnr":
        Tout = _cgnr_prolongation(A, T, pattern, project, apply_Dinv,
                                  maxiter, tol)
    else:
        Tout = _gmres_prolongation(A, T, pattern, project, apply_Dinv,
                                   maxiter, tol)

    if Cpt_params is not None and Cpt_params[0]:
        params = Cpt_params[1]
        Tout = (to_csr(params["I_F"]) @ Tout + to_csr(params["P_I"])).tocsr()

    if postfilter:
        if "theta" in postfilter:
            Tnew = filter_matrix_rows(Tout, postfilter["theta"])
            Tout = _restore_constraint(Tout, Tnew, B)
        if "k" in postfilter:
            Tnew = truncate_rows(Tout, postfilter["k"])
            Tout = _restore_constraint(Tout, Tnew, B)

    Tout.eliminate_zeros()
    return Tout


def _restore_constraint(Tout, Tnew, B):
    """After filtering Tout -> Tnew, add the minimum-norm per-row correction
    on Tnew's pattern so that (Tnew + U) @ B == Tout @ B (preserving the
    interpolation of the near-nullspace)."""
    defect = np.asarray((Tout - Tnew) @ B)            # (n, k)
    BtBinv = compute_BtBinv(B, Tnew)
    n = Tnew.shape[0]
    coef = np.einsum("nk,nkl->nl", defect, BtBinv)    # (n, k)
    U = Tnew.copy()
    rows = np.repeat(np.arange(n), np.diff(U.indptr))
    U.data = np.einsum("ek,ek->e", coef[rows], np.conj(np.asarray(B)[U.indices]))
    out = (Tnew + U).tocsr()
    out.eliminate_zeros()
    return out


def _frob_inner(X, Y):
    """<X, Y> = sum_ij conj(X_ij) Y_ij over matching patterns."""
    return complex((X.conjugate().multiply(Y)).sum()) \
        if np.iscomplexobj(X.data) else float((X.multiply(Y)).sum())


def _cg_prolongation_bsr(A, T, AtildeN, B, maxiter, tol, degree, weighting):
    """Fixed-pattern energy CG entirely in BSR block form (role of the
    reference's incomplete_mat_mult_bsr-based energy loop,
    smoothed_aggregation.h:797 + smooth.py:283, for node-blocked A).

    Every iterate lives as dense (R, K) blocks on the BLOCK pattern
    |AtildeN|^degree @ block-pattern(T) — the scalar grown pattern's
    block-dense closure (identical in the usual case: UnAmal'ed strength
    times block-dense tentative blocks IS block dense).  vs the flattened
    scalar path this removes the unamalgamation, runs the pattern growth
    on the node graph (R^2x smaller), does R*R-fewer slot lookups per FMA
    in the masked products, and computes one Gram pinv per block row
    instead of per scalar row.  Returns None (caller falls back to the
    scalar flat/generic paths) when the native kernels or the block
    structure don't apply."""
    from ..amg_core import (masked_spgemm_bsr_native,
                            constraint_project_bsr_native,
                            pattern_gram_bsr_native)
    from ..util.linalg import pinv_array

    R = A.blocksize[0]
    if (A.blocksize[1] != R or A.dtype != np.float64
            or np.iscomplexobj(A.data) or np.iscomplexobj(B)):
        return None
    B = np.asarray(B, dtype=np.float64)
    K = B.shape[1]
    if T.shape[0] % R or T.shape[1] % K:
        return None
    try:
        Tb = T.tobsr(blocksize=(R, K))
    except ValueError:
        return None
    nbr, nbc = Tb.shape[0] // R, Tb.shape[1] // K
    if AtildeN is not None and AtildeN.shape[0] != nbr:
        return None
    if (np.diff(A.indptr) == 0).any():
        return None                       # empty block rows: scalar path

    # node-level pattern growth (structure only)
    pat = sp.csr_matrix(
        (np.ones(Tb.indices.shape[0]), Tb.indices.copy(), Tb.indptr.copy()),
        shape=(nbr, nbc))
    if degree > 0 and AtildeN is not None:
        G = to_csr(AtildeN).copy()
        G.data = np.ones_like(G.data, dtype=np.float64)
        for _ in range(degree):
            pat = (G @ pat).tocsr()
    pat.data = np.ones_like(pat.data)
    pat.sort_indices()
    Pp, Pj = pat.indptr, pat.indices
    nnzb = pat.nnz

    gram = pattern_gram_bsr_native(Pp, Pj, K, B)
    if gram is None:
        return None
    Gb = np.ascontiguousarray(pinv_array(gram))

    # weighting operator, per scalar row, from the BSR data directly
    data = A.data
    if weighting == "local":
        Dv = np.add.reduceat(np.abs(data).sum(axis=2),
                             A.indptr[:-1], axis=0)     # (nbr, R)
    else:                                               # "diagonal"
        Dv = A.diagonal().reshape(nbr, R)
    Dinv = np.where(Dv != 0, 1.0 / np.where(Dv != 0, Dv, 1), 0.0)

    # embed T's blocks into pattern slots (global sorted block-major keys)
    key_pat = Pj.astype(np.int64) + np.int64(nbc) * np.repeat(
        np.arange(nbr, dtype=np.int64), np.diff(Pp))
    key_T = Tb.indices.astype(np.int64) + np.int64(nbc) * np.repeat(
        np.arange(nbr, dtype=np.int64), np.diff(Tb.indptr))
    pos = np.searchsorted(key_pat, key_T)
    if pos.max(initial=-1) >= nnzb or not (key_pat[pos] == key_T).all():
        return None                     # T's pattern escapes the target

    Ap, Aj = A.indptr, A.indices

    def project(vals):
        if not constraint_project_bsr_native(vals, Pp, Pj, R, K, B, Gb):
            raise RuntimeError("native projection vanished mid-solve")
        return vals

    AT = masked_spgemm_bsr_native(nbc, R, K, Ap, Aj, data,
                                  Tb.indptr, Tb.indices, Tb.data, Pp, Pj)
    if AT is None:
        return None

    brow = np.repeat(np.arange(nbr), np.diff(Pp))
    dinv_e = Dinv[brow][:, :, None]                     # (nnzb, R, 1)

    tvals = np.zeros((nnzb, R, K), dtype=np.float64)
    tvals[pos] = Tb.data
    rvals = project(-AT)
    normr0 = max(np.abs(rvals).max(initial=0.0), 1e-300)

    pvals = tvals
    oldsum = 0.0
    ptvals = None
    for _ in range(maxiter):
        if np.abs(rvals).max(initial=0.0) < tol * normr0:
            break
        zvals = rvals * dinv_e
        newsum = float(rvals.ravel() @ zvals.ravel())
        if newsum == 0:
            break
        if oldsum == 0:
            ptvals = zvals
        else:
            ptvals = zvals + (newsum / oldsum) * ptvals
        oldsum = newsum

        ap = project(masked_spgemm_bsr_native(nbc, R, K, Ap, Aj, data,
                                              Pp, Pj, ptvals, Pp, Pj))
        d = float(ptvals.ravel() @ ap.ravel())
        if d == 0:
            break
        alpha = newsum / d
        pvals = pvals + alpha * ptvals
        rvals = rvals - alpha * ap
    out = sp.bsr_matrix((pvals.copy(), Pj.copy(), Pp.copy()),
                        shape=T.shape).tocsr()
    out.sort_indices()
    return out


def _cg_prolongation_flat(A, T, pattern, B, BtBinv, Dinv, fmask, maxiter,
                          tol):
    """Fixed-pattern CG: same minimization as ``_cg_prolongation`` but with
    every iterate (R, Z, P_temp, AP, P) stored as a flat value array over
    ``pattern``'s CSR structure.

    After projection every matrix in the iteration lives on exactly this
    pattern, so the scipy symbolic merges (sparse adds, ``multiply``,
    ``tocsr`` sorts) the generic path pays per iteration collapse into
    numpy axpys; the projection's per-entry B gather is hoisted out of the
    loop.  Returns None (caller falls back to the generic path) when the
    native masked-SpGEMM kernel is unavailable for this dtype or T's
    pattern is not contained in ``pattern``."""
    from ..amg_core import masked_spgemm_native

    if np.iscomplexobj(A.data) or A.dtype != np.float64 \
            or np.iscomplexobj(B):
        return None
    P0 = to_csr(pattern)
    P0.sort_indices()
    T = to_csr(T)
    T.sort_indices()
    n, ncols = P0.shape
    indptr, indices = P0.indptr, P0.indices
    nnz = P0.nnz

    # embed T's values into pattern slots (global sorted row-major keys)
    key_pat = indices.astype(np.int64) + np.int64(ncols) * np.repeat(
        np.arange(n, dtype=np.int64), np.diff(indptr))
    key_T = T.indices.astype(np.int64) + np.int64(ncols) * np.repeat(
        np.arange(n, dtype=np.int64), np.diff(T.indptr))
    pos = np.searchsorted(key_pat, key_T)
    if pos.max(initial=-1) >= nnz or not (key_pat[pos] == key_T).all():
        return None                     # T's pattern escapes the target

    def view(vals):
        M = sp.csr_matrix((vals, indices, indptr), shape=(n, ncols))
        M.has_sorted_indices = True
        return M

    AT = masked_spgemm_native(A, T, P0)
    if AT is None:
        return None

    from ..amg_core import constraint_project_native

    rows = np.repeat(np.arange(n), np.diff(indptr))
    Bd = np.ascontiguousarray(np.asarray(B), dtype=np.float64)
    Gd = np.ascontiguousarray(np.asarray(BtBinv), dtype=np.float64)
    fmask_u8 = (np.ascontiguousarray(fmask, dtype=np.uint8)
                if fmask is not None else None)
    dinv_e = np.asarray(Dinv)[rows]
    Bc_e = None

    def project(vals):
        # fused native kernel (in place); numpy fallback keeps identical math
        if constraint_project_native(vals, indptr, indices, Bd, Gd,
                                     fmask_u8):
            return vals
        nonlocal Bc_e
        if Bc_e is None:
            Bc_e = Bd[indices]                        # (nnz, k)
        if fmask is not None:
            vals = vals * fmask[rows]
        UB = np.asarray(view(vals) @ Bd)              # (n, k)
        coef = np.einsum("nk,nkl->nl", UB, Gd)
        return vals - np.einsum("ek,ek->e", coef[rows], Bc_e)

    tvals = np.zeros(nnz, dtype=A.dtype)
    tvals[pos] = T.data
    rvals = project(-AT.data)
    normr0 = max(np.abs(rvals).max(initial=0.0), 1e-300)

    pvals = tvals
    oldsum = 0.0
    ptvals = None
    for _ in range(maxiter):
        if np.abs(rvals).max(initial=0.0) < tol * normr0:
            break
        zvals = rvals * dinv_e
        newsum = float(rvals @ zvals)
        if newsum == 0:
            break
        if oldsum == 0:
            ptvals = zvals
        else:
            ptvals = zvals + (newsum / oldsum) * ptvals
        oldsum = newsum

        ap = project(masked_spgemm_native(A, view(ptvals), P0).data)
        d = float(ptvals @ ap)
        if d == 0:
            break
        alpha = newsum / d
        pvals = pvals + alpha * ptvals
        rvals = rvals - alpha * ap
    return view(pvals.copy())


def _cg_prolongation(A, T, pattern, project, apply_Dinv, maxiter, tol):
    """Pattern-constrained CG on trace(P^H A P)
    (reference cg_prolongation_smoothing, smooth.py:283)."""
    R = (-(A @ T)).tocsr().multiply(pattern).tocsr()
    R = project(R)
    normr0 = max(abs(R).max() if R.nnz else 0.0, 1e-300)

    P = T
    oldsum = 0.0
    P_temp = None
    for _ in range(maxiter):
        if R.nnz == 0 or abs(R).max() < tol * normr0:
            break
        Z = apply_Dinv(R)
        newsum = _frob_inner(R, Z)
        if newsum == 0:
            break
        if oldsum == 0:
            P_temp = Z
        else:
            beta = newsum / oldsum
            P_temp = (Z + beta * P_temp).tocsr()
        oldsum = newsum

        AP = _masked_product(A, P_temp, pattern)
        AP = project(AP)
        d = _frob_inner(P_temp, AP)
        if d == 0:
            break
        alpha = newsum / d
        P = (P + alpha * P_temp).tocsr()
        R = (R - alpha * AP).tocsr()
    return P.tocsr()


def _cgnr_prolongation(A, T, pattern, project, apply_Dinv, maxiter, tol):
    """CGNR variant for nonsymmetric A (reference smooth.py:460):
    minimizes ||A P||_F over the pattern (normal equations A^H A)."""
    AH = A.conjugate().T.tocsr()
    R = (-(A @ T)).tocsr()                        # unmasked residual of A P
    P = T
    # gradient restricted to pattern
    G = (AH @ R).tocsr().multiply(pattern).tocsr()
    G = project(G)
    normr0 = max(abs(G).max() if G.nnz else 0.0, 1e-300)
    oldsum = 0.0
    P_temp = None
    for _ in range(maxiter):
        if G.nnz == 0 or abs(G).max() < tol * normr0:
            break
        Z = apply_Dinv(G)
        newsum = _frob_inner(G, Z)
        if newsum == 0:
            break
        if oldsum == 0:
            P_temp = Z
        else:
            beta = newsum / oldsum
            P_temp = (Z + beta * P_temp).tocsr()
        oldsum = newsum
        AP = (A @ P_temp).tocsr()
        d = _frob_inner(AP, AP)
        if d == 0:
            break
        alpha = newsum / d
        P = (P + alpha * P_temp).tocsr()
        R = (R - alpha * AP).tocsr()
        G = (AH @ R).tocsr().multiply(pattern).tocsr()
        G = project(G)
    return P.tocsr()


def _gmres_prolongation(A, T, pattern, project, apply_Dinv, maxiter, tol):
    """GMRES variant for nonsymmetric A (reference smooth.py:669), in the
    matrix Frobenius inner product."""
    R = (-(A @ T)).tocsr().multiply(pattern).tocsr()
    R = project(R)
    beta = np.sqrt(abs(_frob_inner(R, R)))
    if beta == 0:
        return T.tocsr()
    m = int(maxiter)
    V = [(1.0 / beta) * R]
    H = np.zeros((m + 1, m), dtype=complex if np.iscomplexobj(R.data)
                 else float)
    for j in range(m):
        W = _masked_product(A, apply_Dinv(V[j]), pattern)
        W = project(W)
        for i in range(j + 1):
            H[i, j] = _frob_inner(V[i], W)
            W = (W - H[i, j] * V[i]).tocsr()
        H[j + 1, j] = np.sqrt(abs(_frob_inner(W, W)))
        if H[j + 1, j] < 1e-14:
            m = j + 1
            break
        V.append((1.0 / H[j + 1, j]) * W)
    k = min(m, len(V))
    e1 = np.zeros(k + 1, dtype=H.dtype)
    e1[0] = beta
    y, *_ = np.linalg.lstsq(H[:k + 1, :k], e1, rcond=None)
    P = T.tocsr()
    for j in range(k):
        P = (P + y[j] * apply_Dinv(V[j])).tocsr()
    return P
