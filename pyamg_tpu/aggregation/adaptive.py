"""Adaptive smoothed aggregation (αSA).

Reference parity: pyamg/aggregation/adaptive.py (``adaptive_sa_solver`` :113,
``initial_setup_stage`` :363, ``general_setup_stage`` :575): bootstrap the
near-nullspace by relaxing on A x = 0, then improve it by running the
current solver on the homogeneous system.
"""

from __future__ import annotations

import numpy as np

from ..util.utils import to_csr, unpack_arg
from .aggregation import smoothed_aggregation_solver

__all__ = ["adaptive_sa_solver"]


def _relax_homogeneous(A, x, method, iterations):
    """Relax on A x = 0 in place; returns x."""
    from ..relaxation import relaxation as rel

    fn, kwargs = unpack_arg(method)
    if not hasattr(rel, fn):
        # device-only smoother names (zebra, chebyshev, ...) fall back to
        # Gauss-Seidel for the host-side candidate relaxation
        fn, kwargs = "gauss_seidel", {"sweep": "symmetric"}
    fn = getattr(rel, fn)
    b = np.zeros(A.shape[0], dtype=A.dtype)
    kwargs = dict(kwargs)
    kwargs.pop("iterations", None)
    fn(A, x, b, iterations=iterations, **kwargs)
    return x


def adaptive_sa_solver(A, initial_candidates=None, symmetry="hermitian",
                       pdef=True, num_candidates=1, candidate_iters=5,
                       improvement_iters=0, epsilon=0.1,
                       max_levels=10, max_coarse=100,
                       aggregate="standard",
                       prepostsmoother=("gauss_seidel",
                                        {"sweep": "symmetric"}),
                       smooth=("jacobi", {}), strength="symmetric",
                       coarse_solver="pinv", seed=0, **kwargs):
    """Create an adaptive SA solver; returns (ml, work)
    (reference adaptive.py:113).

    The initial stage generates ``num_candidates`` near-nullspace candidates
    by relaxation on A x = 0; the general stage improves them by cycling the
    current solver on the homogeneous system.
    """
    A = to_csr(A)
    n = A.shape[0]
    rng = np.random.default_rng(seed)
    work = 0.0

    def build(B):
        return smoothed_aggregation_solver(
            A, B=B, symmetry=symmetry, strength=strength,
            aggregate=aggregate, smooth=smooth,
            presmoother=prepostsmoother, postsmoother=prepostsmoother,
            max_levels=max_levels, max_coarse=max_coarse,
            coarse_solver=coarse_solver)

    # ---- initial stage (reference initial_setup_stage :363) -------------
    if initial_candidates is None:
        x = rng.random(n).astype(A.dtype)
        if np.iscomplexobj(np.zeros(1, dtype=A.dtype)):
            x = x + 1j * rng.random(n)
        x = _relax_homogeneous(A, x, prepostsmoother, candidate_iters)
        work += candidate_iters * A.nnz
        B = x[:, None]
    else:
        B = np.asarray(initial_candidates, dtype=A.dtype)
        if B.ndim == 1:
            B = B[:, None]

    nb = np.linalg.norm(B, axis=0)
    B = B / np.where(nb == 0, 1, nb)
    ml = build(B)

    # ---- general stage: extra candidates (reference :575) ---------------
    while B.shape[1] < num_candidates:
        x = rng.random(n).astype(A.dtype)
        residuals = []
        x = ml.solve(np.zeros(n, dtype=A.dtype), x0=x,
                     maxiter=candidate_iters, tol=1e-16,
                     residuals=residuals)
        work += candidate_iters * sum(l.nnz for l in ml.levels)
        x = np.asarray(x)
        # if the solver already annihilates x, stop adding candidates
        if residuals and residuals[0] > 0 and \
                (residuals[-1] / residuals[0]) ** (1.0 /
                                                   max(len(residuals) - 1, 1)) \
                < epsilon:
            break
        nx = np.linalg.norm(x)
        if nx == 0:
            break
        # orthonormalize against existing candidates
        for k in range(B.shape[1]):
            x = x - (B[:, k].conj() @ x) * B[:, k]
        nx = np.linalg.norm(x)
        if nx < 1e-12:
            break
        B = np.column_stack([B, x / nx])
        ml = build(B)

    # ---- improvement iterations -----------------------------------------
    for _ in range(improvement_iters):
        Bnew = np.zeros_like(B)
        for k in range(B.shape[1]):
            x = ml.solve(np.zeros(n, dtype=A.dtype), x0=B[:, k],
                         maxiter=candidate_iters, tol=1e-16)
            work += candidate_iters * sum(l.nnz for l in ml.levels)
            x = np.asarray(x)
            nx = np.linalg.norm(x)
            Bnew[:, k] = x / (nx if nx else 1.0)
        # re-orthonormalize
        Q, _ = np.linalg.qr(Bnew)
        B = Q[:, :B.shape[1]]
        ml = build(B)

    return ml, float(work) / max(A.nnz, 1)
