"""Sparse structural ops used by the setup phase.

The setup phase is staged per-level on the host (shapes are data-dependent —
SURVEY.md §7 "hard parts" (b)), so structural products use scipy's SpGEMM and
the results are re-laid-out into padded ELL for the device.  Numeric-only
re-products (same pattern) can later move on-device via the masked-SpGEMM
kernel (reference: ``incomplete_mat_mult_csr`` evolution_strength.h:676).

Examples
--------
>>> import numpy as np, scipy.sparse as sp
>>> from pyamg_tpu.sparse.ops import transpose, spgemm
>>> M = sp.csr_matrix(np.array([[1., 2., 0.], [0., 3., 4.]]))
>>> bool((transpose(M).to_scipy() != M.T).nnz == 0)
True
>>> C = spgemm(M, M.T)
>>> bool(np.allclose(C.to_scipy().toarray(), (M @ M.T).toarray()))
True
"""

from __future__ import annotations

from .ell import SparseELL
from .bell import BlockELL


def _sp(A):
    if isinstance(A, (SparseELL, BlockELL)):
        return A.to_scipy()
    return A


def spgemm(A, B, width=None, dtype=None) -> SparseELL:
    """C = A @ B (host symbolic+numeric), returned as padded ELL."""
    import scipy.sparse as sp

    C = sp.csr_matrix(_sp(A)) @ sp.csr_matrix(_sp(B))
    C.eliminate_zeros()
    return SparseELL.from_scipy(C, width=width, dtype=dtype)


def rap(R, A, P, dtype=None) -> SparseELL:
    """Galerkin triple product A_c = R·A·P.

    Reference: ``A = R * A * P`` in classical.py:187 / aggregation.py:429.
    """
    import scipy.sparse as sp

    C = sp.csr_matrix(_sp(R)) @ sp.csr_matrix(_sp(A)) @ sp.csr_matrix(_sp(P))
    C.eliminate_zeros()
    return SparseELL.from_scipy(C, dtype=dtype)


def transpose(A) -> SparseELL:
    import scipy.sparse as sp

    return SparseELL.from_scipy(sp.csr_matrix(_sp(A)).T.tocsr())
