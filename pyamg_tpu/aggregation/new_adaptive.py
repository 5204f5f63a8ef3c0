"""Adaptive SA rewrite with Ritz-based candidate filtering (fork feature).

Reference parity: pyamg/aggregation/new_adaptive.py (``asa_solver`` /
``tl_sa_solver`` :343, ``global_ritz_process`` :179,
``local_ritz_process`` :254, ``try_solve`` :523).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..util.utils import to_csr
from .aggregation import smoothed_aggregation_solver

__all__ = ["asa_solver", "tl_sa_solver", "global_ritz_process",
           "local_ritz_process"]


def global_ritz_process(A, B1, B2=None, weak_tol=15.0, verbose=False):
    """Ritz filtering of candidate vectors in the A-inner product
    (reference new_adaptive.py:179).

    Orthonormalizes [B1, B2], computes the Ritz decomposition of A in that
    span, and keeps Ritz vectors whose approximation quality
    1 / (eigenvalue * n) exceeds the weak tolerance.
    Returns the filtered (and A-graded) candidate set.
    """
    A = to_csr(A)
    B = np.asarray(B1)
    if B.ndim == 1:
        B = B[:, None]
    if B2 is not None:
        B2 = np.asarray(B2)
        if B2.ndim == 1:
            B2 = B2[:, None]
        B = np.column_stack([B, B2])

    Q, _ = np.linalg.qr(B)
    H = Q.conj().T @ (A @ Q)
    H = 0.5 * (H + H.conj().T)
    evals, evecs = np.linalg.eigh(H)
    V = Q @ evecs

    # smaller Ritz value = smoother vector = better candidate; keep vectors
    # within weak_tol of the smoothest one
    thresh = float(evals[0].real) * weak_tol + 1e-300
    keep = [k for k in range(V.shape[1]) if evals[k].real <= thresh]
    if not keep:
        keep = [0]
    if verbose:
        print(f"global Ritz: kept {len(keep)}/{V.shape[1]} candidates, "
              f"evals={np.round(evals.real, 3)}")
    return V[:, keep]


def local_ritz_process(A, AggOp, B, weak_tol=15.0, verbose=False):
    """Per-aggregate Ritz filtering (reference new_adaptive.py:254): in each
    aggregate, keep only the locally independent low-energy combinations of
    the candidates."""
    A = to_csr(A)
    AggOp = sp.csr_matrix(AggOp)
    B = np.asarray(B)
    if B.ndim == 1:
        B = B[:, None]
    n, K = B.shape
    if K == 1:
        return B

    Acsc = AggOp.tocsc()
    out = np.zeros_like(B)
    for a in range(AggOp.shape[1]):
        rows = Acsc.indices[Acsc.indptr[a]:Acsc.indptr[a + 1]]
        Ba = B[rows]
        G = Ba.conj().T @ Ba
        evals, evecs = np.linalg.eigh(G)
        total = max(float(evals.sum().real), 1e-300)
        keep = evals.real > total / (weak_tol * max(K, 1))
        filt = evecs[:, keep]
        out[rows] = Ba @ (filt @ filt.conj().T)
    # drop near-zero columns
    norms = np.linalg.norm(out, axis=0)
    cols = norms > 1e-12 * max(norms.max(), 1e-300)
    if not cols.any():
        return B[:, :1]
    return out[:, cols]


def tl_sa_solver(A, B=None, max_candidates=3, improvement_iters=8,
                 target_convergence=0.7, weak_tol=15.0, verbose=False,
                 max_levels=10, max_coarse=100, seed=0, **sa_kwargs):
    """Two-level-motivated adaptive SA driver (reference
    new_adaptive.py:343): iteratively discover candidates by running the
    current solver on A x = 0, Ritz-filter the candidate set, rebuild."""
    A = to_csr(A)
    n = A.shape[0]
    rng = np.random.default_rng(seed)

    if B is None:
        x = rng.random(n).astype(A.dtype) - 0.5
        B = x[:, None]
    else:
        B = np.asarray(B, dtype=A.dtype)
        if B.ndim == 1:
            B = B[:, None]

    B = global_ritz_process(A, B, weak_tol=weak_tol, verbose=verbose)
    ml = smoothed_aggregation_solver(A, B=B, max_levels=max_levels,
                                     max_coarse=max_coarse, **sa_kwargs)

    for _ in range(max_candidates):
        # probe convergence on the homogeneous problem (try_solve :523)
        x = rng.random(n).astype(A.dtype) - 0.5
        res = []
        x = ml.solve(np.zeros(n, dtype=A.dtype), x0=x,
                     maxiter=improvement_iters, tol=1e-16, residuals=res)
        x = np.asarray(x)
        factor = (res[-1] / res[0]) ** (1.0 / max(len(res) - 1, 1)) \
            if len(res) > 1 and res[0] > 0 else 0.0
        if verbose:
            print(f"asa probe: convergence factor {factor:.3f} with "
                  f"{B.shape[1]} candidate(s)")
        if factor < target_convergence or B.shape[1] >= max_candidates:
            break
        # the slow-to-converge error is the new candidate
        B = global_ritz_process(A, B, x, weak_tol=weak_tol, verbose=verbose)
        ml = smoothed_aggregation_solver(A, B=B, max_levels=max_levels,
                                         max_coarse=max_coarse, **sa_kwargs)

    return ml


def asa_solver(A, B=None, **kwargs):
    """Adaptive SA solver (fork rewrite).  Returns a MultilevelSolver."""
    return tl_sa_solver(A, B=B, **kwargs)
