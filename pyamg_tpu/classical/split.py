"""C/F splitting methods for classical AMG.

Reference parity: pyamg/classical/split.py (``RS`` :110, ``PMIS`` :159,
``PMISc`` :196, ``CLJP`` :241, ``CLJPc`` :295, ``MIS`` :334) and the
amg_core kernels ``rs_cf_splitting`` (ruge_stuben.h:158) and
``cljp_naive_splitting`` (ruge_stuben.h:317).

RS is the inherently sequential classical algorithm (exact lambda-ordered
interval-list implementation, traversal-order-faithful).  PMIS/CLJP are the parallel-friendly round-based
formulations — the device-path defaults (SURVEY.md §2.3).

Convention: splitting[i] == 1 for C points, 0 for F points.
"""

from __future__ import annotations


import numpy as np
import scipy.sparse as sp

from ..util.utils import to_csr

__all__ = ["RS", "PMIS", "PMISc", "CLJP", "CLJPc", "MIS", "grid_splitting",
           "preprocess_strength"]


def grid_splitting(grid):
    """Geometric red-black coarsening on a structured grid: C points at
    even coordinate-parity (the splitting classical RS converges to on
    cross-stencil problems — every F point keeps a full set of C
    neighbors, so direct interpolation is well-posed).

    The deterministic coarse ordering keeps the number of distinct
    Galerkin diagonals small, so coarse operators stay on the DIA fast
    path.  Returns (splitting, coarse_grid=None — the C set is a rotated
    lattice, not a rectangular grid).
    """
    grid = tuple(int(g) for g in grid)
    N = int(np.prod(grid))
    coords = np.unravel_index(np.arange(N), grid)
    parity = np.zeros(N, dtype=np.int64)
    for c in coords:
        parity += c
    isC = (parity % 2) == 0
    return isC.astype(np.int32), None

F_NODE, C_NODE, U_NODE = 0, 1, -1


def preprocess_strength(S):
    """Binary, zero-diagonal strength pattern + its transpose.

    Structure-only: every consumer (native/Python RS, the MIS/CLJP
    splittings, vertex coloring) reads indptr/indices, so the pattern is
    built by one mask pass over S's index arrays with 1-byte placeholder
    data — no O(nnz) matrix copy, float ones, setdiag or eliminate_zeros
    passes.  Entry ORDER within rows is preserved exactly (the RS
    traversal order is observable in coarse-grid structure)."""
    S = to_csr(S)
    n = S.shape[0]
    rows = np.repeat(np.arange(n, dtype=S.indices.dtype),
                     np.diff(S.indptr))
    offd = S.indices != rows
    indices = S.indices[offd]
    removed = np.bincount(rows[~offd], minlength=n)
    indptr = (S.indptr
              - np.concatenate([[0], np.cumsum(removed)])).astype(
                  S.indptr.dtype, copy=False)
    S2 = sp.csr_matrix(
        (np.ones(indices.size, dtype=np.uint8), indices, indptr),
        shape=S.shape)
    if S.has_sorted_indices:
        S2.has_sorted_indices = True
    T = S2.T.tocsr()
    return S2, T


def RS(S):
    """Classical Ruge-Stuben C/F splitting (first pass), exact semantics of
    ruge_stuben.h:158: pick max-lambda node as C, its dependents become F,
    and each new F node's influences gain weight.

    Uses the native C++ kernel (amg_core/core.cpp) when available; the
    Python interval-list implementation below is the fallback (same
    traversal order, same hierarchies).

    Examples
    --------
    >>> import numpy as np
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.classical.split import RS
    >>> from pyamg_tpu.strength import classical_strength_of_connection
    >>> A = poisson((8, 8), format='csr')
    >>> S = classical_strength_of_connection(A, theta=0.25)
    >>> splitting = RS(S)
    >>> sorted(np.unique(splitting).tolist())
    [0, 1]
    """
    S, T = preprocess_strength(S)
    from ..amg_core import rs_cf_splitting as _native_rs

    native = _native_rs(S, T)
    if native is not None:
        return native
    # Pure-Python port of the SAME interval-list formulation as the native
    # kernel (amg_core/core.cpp rs_cf_splitting) — the traversal/tie-break
    # ORDER is observable in coarse-grid structure at deeper levels, so the
    # fallback must move node-for-node with it (a max-heap formulation
    # yields different tie-breaks and different hierarchies; see
    # tests/test_parity.py::TestReferenceFingerprints).
    n = S.shape[0]
    Sp, Sj = S.indptr, S.indices
    Tp, Tj = T.indptr, T.indices
    lam = np.diff(T.indptr).astype(np.int64)

    ivl_start = np.zeros(n + 2, dtype=np.int64)
    ivl_len = np.zeros(n + 2, dtype=np.int64)
    at_pos = np.empty(n, dtype=np.int64)
    pos_of = np.empty(n, dtype=np.int64)
    np.add.at(ivl_len, lam, 1)
    acc = 0
    for v in range(n + 1):
        ivl_start[v] = acc
        acc += ivl_len[v]
        ivl_len[v] = 0
    for i in range(n):
        p = ivl_start[lam[i]] + ivl_len[lam[i]]
        ivl_len[lam[i]] += 1
        at_pos[p] = i
        pos_of[i] = p

    splitting = np.full(n, U_NODE, dtype=np.int32)
    splitting[lam == 0] = F_NODE

    def swap_nodes(pa, pb):
        pos_of[at_pos[pa]] = pb
        pos_of[at_pos[pb]] = pa
        at_pos[pa], at_pos[pb] = at_pos[pb], at_pos[pa]

    for scan in range(n - 1, -1, -1):
        i = at_pos[scan]
        ivl_len[lam[i]] -= 1
        if splitting[i] == F_NODE:
            continue
        splitting[i] = C_NODE
        # undecided influences become F; their dependencies gain weight
        for j in Tj[Tp[i]:Tp[i + 1]]:
            if splitting[j] != U_NODE:
                continue
            splitting[j] = F_NODE
            for k in Sj[Sp[j]:Sp[j + 1]]:
                if splitting[k] != U_NODE or lam[k] >= n - 1:
                    continue
                lv = lam[k]
                tail = ivl_start[lv] + ivl_len[lv] - 1
                swap_nodes(pos_of[k], tail)
                ivl_len[lv] -= 1
                ivl_len[lv + 1] += 1
                ivl_start[lv + 1] = tail
                lam[k] += 1
        # undecided dependencies lose weight
        for j in Sj[Sp[i]:Sp[i + 1]]:
            if splitting[j] != U_NODE or lam[j] == 0:
                continue
            lv = lam[j]
            head = ivl_start[lv]
            swap_nodes(pos_of[j], head)
            ivl_len[lv] -= 1
            ivl_len[lv - 1] += 1
            ivl_start[lv] += 1
            ivl_start[lv - 1] = ivl_start[lv] - ivl_len[lv - 1]
            lam[j] -= 1

    return (splitting == C_NODE).astype(np.int32)


def _edges(S):
    rows = np.repeat(np.arange(S.shape[0]), np.diff(S.indptr))
    return rows, S.indices


def PMIS(S, seed=0):
    """Parallel Modified Independent Set splitting (reference split.py:159):
    one-pass weighted MIS on the symmetrized strength graph."""
    S, T = preprocess_strength(S)
    lam = np.diff(T.indptr).astype(np.float64)
    rng = np.random.default_rng(seed)
    weights = lam + rng.random(S.shape[0])
    return _weighted_mis_splitting(S, T, weights)


def PMISc(S, method="JP"):
    """PMIS with deterministic coloring-based weights
    (reference split.py:196)."""
    S, T = preprocess_strength(S)
    from ..graph import vertex_coloring

    lam = np.diff(T.indptr).astype(np.float64)
    coloring = vertex_coloring(S, method=method)
    ncolors = coloring.max() + 1
    weights = lam + (coloring + 1) / (ncolors + 1.0)
    return _weighted_mis_splitting(S, T, weights)


def _weighted_mis_splitting(S, T, weights):
    """Rounds: undecided i with weight > all undecided neighbors becomes C;
    undecided neighbors of new C points become F."""
    n = S.shape[0]
    state = np.full(n, U_NODE, dtype=np.int32)
    # no strong connections at all -> F
    iso = (np.diff(S.indptr) == 0) & (np.diff(T.indptr) == 0)
    state[iso] = F_NODE
    rs, cs = _edges(S)
    rt, ct = _edges(T)
    rows = np.concatenate([rs, rt])
    cols = np.concatenate([cs, ct])

    while (state == U_NODE).any():
        active = state == U_NODE
        w = np.where(active, weights, -np.inf)
        nbr_max = np.full(n, -np.inf)
        emask = active[rows] & active[cols]
        np.maximum.at(nbr_max, rows[emask], w[cols[emask]])
        winners = active & (w > nbr_max)
        if not winners.any():
            winners = np.zeros(n, dtype=bool)
            winners[int(np.argmax(np.where(active, w, -np.inf)))] = True
        state[winners] = C_NODE
        # neighbors of C become F
        newF = np.zeros(n, dtype=bool)
        sel = winners[rows]
        newF[cols[sel]] = True
        state[newF & (state == U_NODE)] = F_NODE
    return (state == C_NODE).astype(np.int32)


def CLJP(S, color=False, seed=2448422):
    """Cleary-Luby-Jones-Plassmann splitting, faithful to
    cljp_naive_splitting (ruge_stuben.h:317)."""
    S, T = preprocess_strength(S)
    n = S.shape[0]
    Sp, Sj = S.indptr, S.indices
    Tp, Tj = T.indptr, T.indices

    rng = np.random.default_rng(seed)
    if color:
        from ..graph import vertex_coloring

        coloring = vertex_coloring(S, method="JP")
        ncolors = coloring.max() + 1
        weight = coloring.astype(np.float64) / ncolors
    else:
        weight = rng.random(n)
    # weight[j] += (number of i that depend on j) = |column j| = |T row j|
    weight = weight + np.diff(Tp)

    splitting = np.full(n, U_NODE, dtype=np.int32)
    edgemark = np.ones(S.nnz, dtype=bool)
    rows_S, cols_S = _edges(S)
    c_dep_cache = np.full(n, -1, dtype=np.int64)

    unassigned = n
    while unassigned > 0:
        # select independent set: w_i > w_j for undecided j in S_i ∪ T_i
        active = splitting == U_NODE
        w = np.where(active, weight, -np.inf)
        nbr_max = np.full(n, -np.inf)
        for rows, cols in ((rows_S, cols_S), _edges(T)):
            m = active[rows] & active[cols]
            np.maximum.at(nbr_max, rows[m], w[cols[m]])
        D = active & (w > nbr_max)
        if not D.any():
            D = np.zeros(n, dtype=bool)
            D[int(np.argmax(np.where(active, w, -np.inf)))] = True
        Dlist = np.flatnonzero(D)
        splitting[Dlist] = C_NODE
        unassigned -= Dlist.size

        # P5: undecided j that influence a new C point lose weight
        for c in Dlist:
            for jj in range(Sp[c], Sp[c + 1]):
                j = Sj[jj]
                if splitting[j] == U_NODE and edgemark[jj]:
                    edgemark[jj] = False
                    weight[j] -= 1
                    if weight[j] < 1:
                        splitting[j] = F_NODE
                        unassigned -= 1

        # P6: if j,k both depend on c and j influences k, devalue k
        for c in Dlist:
            dep = Tj[Tp[c]:Tp[c + 1]]
            und = dep[splitting[dep] == U_NODE]
            c_dep_cache[und] = c
            for j in dep:
                for kk in range(Sp[j], Sp[j + 1]):
                    k = Sj[kk]
                    if (splitting[k] == U_NODE and edgemark[kk]
                            and c_dep_cache[k] == c):
                        edgemark[kk] = False
                        weight[k] -= 1
                        if weight[k] < 1:
                            splitting[k] = F_NODE
                            unassigned -= 1

    splitting[splitting == U_NODE] = F_NODE
    return splitting.astype(np.int32)


def CLJPc(S):
    """CLJP with coloring-based deterministic weights
    (reference split.py:295)."""
    return CLJP(S, color=True)


def MIS(S, weights=None, seed=0):
    """Maximal-independent-set splitting (reference split.py:334)."""
    S, T = preprocess_strength(S)
    n = S.shape[0]
    if weights is None:
        rng = np.random.default_rng(seed)
        weights = np.diff(T.indptr) + rng.random(n)
    return _weighted_mis_splitting(S, T, np.asarray(weights, dtype=float))
