"""Compatible relaxation (CR) coarsening.

Reference parity: pyamg/classical/cr.py (``CR`` :81, ``_CRsweep`` :19,
``binormalize`` :220) + amg_core ``cr_helper`` (ruge_stuben.h:641).

CR selects the C set by running relaxation restricted to F points on
A e = 0; points where the error decays slowly are poorly handled by
relaxation and are promoted to C.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..util.utils import to_csr

__all__ = ["CR", "binormalize"]


def _cr_sweep(A, x, findex, nu, method="habituated"):
    """nu sweeps of F-point relaxation on A x = 0; returns per-point
    convergence measure for the last sweep (reference cr.py:19)."""
    from ..relaxation.relaxation import gauss_seidel_indexed, jacobi

    n = A.shape[0]
    b = np.zeros(n)
    norms = []
    for _ in range(nu):
        if method == "habituated":
            # relax everywhere then reset C values to 0
            jacobi(A, x, b, iterations=1, omega=0.7)
            mask = np.ones(n, dtype=bool)
            mask[findex] = False
            x[mask] = 0.0
        else:  # concurrent: relax only F equations
            gauss_seidel_indexed(A, x, b, indices=findex, iterations=1)
        norms.append(np.linalg.norm(x))
    return x, norms


def CR(A, method="habituated", B=None, maxiter=20, nu=3, thetacr=0.7,
       thetacs="auto", seed=0, verbose=False):
    """Compatible-relaxation C/F splitting (reference cr.py:81).

    ``thetacr``: target CR convergence factor — iteration stops once the
    measured rho drops below it.  ``thetacs``: candidate-set threshold on
    the normalized slow-error measure gamma = |e/B| / max|e/B| over F
    points (reference cr.py:101-146 + cr_helper, ruge_stuben.h:641):
    a float is used every iteration, a list is consumed progressively
    (first element first, last held), and ``'auto'`` uses 1 - rho from the
    most recent sweep.  ``B``: target algebraically smooth vector
    (constant when None).

    Returns splitting array (1 = C, 0 = F).

    Examples
    --------
    >>> import numpy as np
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.classical.cr import CR
    >>> A = poisson((8, 8), format='csr')
    >>> splitting = CR(A)
    >>> bool(0 < splitting.sum() < A.shape[0])
    True
    """
    A = to_csr(A)
    n = A.shape[0]
    if A.shape[0] != A.shape[1]:
        raise ValueError("expected square matrix")
    if method not in ("habituated", "concurrent"):
        raise ValueError("method must be 'habituated' or 'concurrent'")
    if not (0 < thetacr < 1):
        raise ValueError("Must have 0 < thetacr < 1")
    if thetacs != "auto":
        sched = [float(t) for t in (thetacs if isinstance(thetacs, (list,
                 tuple)) else [thetacs])]
        if max(sched) >= 1 or min(sched) <= 0:
            raise ValueError("Must have 0 < thetacs < 1")
    else:
        sched = None

    if B is None:
        target = np.ones(n)
    else:
        target = np.asarray(B, dtype=float)
        if target.ndim > 1:
            target = target[:, 0]

    rng = np.random.default_rng(seed)
    splitting = np.zeros(n, dtype=np.int32)   # start: everything F

    for it in range(maxiter):
        findex = np.flatnonzero(splitting == 0)
        if findex.size == 0:
            break
        x = np.zeros(n)
        x[findex] = 1.0 - 2.0 * rng.random(findex.size)
        x, norms = _cr_sweep(A, x, findex, nu, method=method)
        # convergence factor of the CR iteration
        rho = (norms[-1] / norms[0]) ** (1.0 / max(len(norms) - 1, 1)) \
            if norms[0] > 0 else 0.0
        if verbose:
            print(f"CR iter {it}: rho = {rho:.3f}, "
                  f"|C| = {int(splitting.sum())}")
        if rho < thetacr:
            break
        # per-iteration candidate threshold
        if sched is None:
            tcs = 1.0 - rho
        else:
            tcs = sched[0]
            if len(sched) > 1:
                sched.pop(0)
        # candidate measure: normalized slow-to-converge error relative to
        # the target vector (cr_helper's gamma)
        with np.errstate(divide="ignore", invalid="ignore"):
            e = np.abs(np.where(target != 0, x / np.where(target != 0,
                                                          target, 1), x))
        emax = e[findex].max() if findex.size else 0.0
        if emax == 0:
            break
        gamma = e / emax
        candidates = findex[gamma[findex] > tcs]
        if candidates.size == 0:
            break
        # add a weighted independent subset of the candidates to C
        added = _independent_subset(A, candidates, gamma, splitting)
        if added.size == 0:
            break
        splitting[added] = 1

    if splitting.sum() == 0:
        # ensure at least one C point
        splitting[int(np.argmax(np.abs(A.diagonal())))] = 1
    return splitting


def _independent_subset(A, candidates, gamma, splitting):
    """Greedy maximal independent subset of candidate nodes by the
    cr_helper weight omega_i = |N_i ∩ F| + gamma_i, heaviest first
    (ruge_stuben.h:641)."""
    indptr, indices = A.indptr, A.indices
    nF = np.array([int((splitting[indices[indptr[i]:indptr[i + 1]]]
                        == 0).sum()) for i in candidates], dtype=float)
    omega = nF + gamma[candidates]
    order = candidates[np.argsort(-omega, kind="stable")]
    chosen = []
    excluded = set()
    for i in order:
        if i in excluded:
            continue
        chosen.append(i)
        excluded.update(indices[indptr[i]:indptr[i + 1]].tolist())
    return np.array(chosen, dtype=np.int64)


def binormalize(A, tol=1e-5, maxiter=10):
    """Binormalize A so all row (and column) 2-norms are equal
    (reference cr.py:220, after Livne & Golub)."""
    A = to_csr(A).copy()
    n = A.shape[0]
    d = np.ones(n)
    B = A.multiply(A.conjugate()).real.tocsr()   # |A|^2 pattern
    for _ in range(maxiter):
        beta = B @ d
        beta_mean = beta.mean()
        if np.abs(beta / beta_mean - 1).max() < tol:
            break
        d = d * np.sqrt(beta_mean / np.maximum(beta, 1e-300))
    dsqrt = np.sqrt(np.abs(d))
    D = sp.dia_matrix((dsqrt[None, :], [0]), shape=A.shape)
    C = (D @ A @ D).tocsr()
    return C
