"""Graph algorithms for coarsening, coloring and ordering.

Reference parity: pyamg/graph.py + pyamg/amg_core/graph.h (SURVEY.md §2.1-2.2:
``maximal_independent_set`` graph.h:35/91, ``vertex_coloring_*``
graph.h:172-291, ``bellman_ford`` graph.h:346, ``lloyd_cluster`` graph.h:389,
``breadth_first_search`` graph.h:607, ``connected_components`` graph.h:661).

Host-side implementations are vectorized numpy, favoring the *parallel*
formulations (Luby-style randomized MIS, Jones-Plassmann coloring) that the
reference already carries — the same round-based algorithms that would run
data-parallel on the device.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.csgraph  # noqa: F401  (ensure sp.csgraph is bound)

from .util.utils import row_reduce

__all__ = [
    "max_value", "maximal_independent_set", "vertex_coloring",
    "bellman_ford", "lloyd_cluster", "breadth_first_search",
    "connected_components", "symmetric_rcm", "pseudo_peripheral_node",
]


def _graph_csr(G):
    from .util.utils import to_csr

    G = to_csr(G)
    if G.shape[0] != G.shape[1]:
        raise ValueError("expected square matrix")
    return G


def max_value(G):
    return int(G.shape[0])


def maximal_independent_set(G, algo="parallel", k=None, seed=0):
    """Maximal independent set; 0/1 flags per node.

    ``algo='serial'`` is the greedy lexicographic MIS (graph.h:35);
    ``algo='parallel'`` is Luby's randomized round-based MIS (graph.h:91);
    ``k`` requests a distance-k MIS (graph.h:520, via graph power).

    Examples
    --------
    >>> import numpy as np
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.graph import maximal_independent_set
    >>> G = poisson((8, 8), format='csr')
    >>> mis = maximal_independent_set(G)
    >>> bool(0 < mis.sum() < G.shape[0])
    True
    """
    G = _graph_csr(G)
    n = G.shape[0]
    if k is not None and k > 1:
        Gk = G.copy()
        Gk.data = np.ones_like(Gk.data)
        P = Gk
        for _ in range(k - 1):
            P = (P @ Gk).tocsr()
        G = P
    if algo == "serial":
        mis = np.zeros(n, dtype=np.int32)
        excluded = np.zeros(n, dtype=bool)
        indptr, indices = G.indptr, G.indices
        for i in range(n):
            if not excluded[i]:
                mis[i] = 1
                excluded[i] = True
                excluded[indices[indptr[i]:indptr[i + 1]]] = True
        return mis
    if algo == "parallel":
        rng = np.random.default_rng(seed)
        weight = rng.random(n)
        state = np.zeros(n, dtype=np.int8)  # 0 undecided, 1 in MIS, -1 out
        G1 = G.copy()
        G1.data = np.ones_like(G1.data, dtype=np.float64)
        G1.setdiag(0)
        G1.eliminate_zeros()
        while (state == 0).any():
            active = state == 0
            w = np.where(active, weight + np.arange(n) * 1e-12, -np.inf)
            # neighbor max weight among active nodes
            nbr_max = np.full(n, -np.inf)
            rows = np.repeat(np.arange(n), np.diff(G1.indptr))
            wj = w[G1.indices]
            np.maximum.at(nbr_max, rows, wj)
            winners = active & (w > nbr_max)
            if not winners.any():
                # break ties deterministically: pick the active node with
                # globally max weight
                winners = np.zeros(n, dtype=bool)
                winners[int(np.nanargmax(np.where(active, w, -np.inf)))] = True
            state[winners] = 1
            # exclude neighbors of winners
            excl = np.zeros(n, dtype=bool)
            win_rows = np.flatnonzero(winners)
            for i in win_rows:
                excl[G1.indices[G1.indptr[i]:G1.indptr[i + 1]]] = True
            state[excl & (state == 0)] = -1
        return (state == 1).astype(np.int32)
    raise ValueError(f"unknown algo {algo!r}")


def vertex_coloring(G, method="JP", seed=0):
    """Vertex coloring of the graph of G; returns int array of colors.

    ``method='MIS'``/'JP': Jones-Plassmann rounds (graph.h:243);
    'FF'/'first-fit': greedy first-fit (graph.h:201);
    'LDF': largest-degree-first (graph.h:291).

    Examples
    --------
    >>> import numpy as np
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.graph import vertex_coloring
    >>> G = poisson((8, 8), format='csr')
    >>> c = vertex_coloring(G)
    >>> int(c.min())
    0
    """
    G = _graph_csr(G)
    n = G.shape[0]
    G1 = G.copy()
    G1.data = np.ones_like(G1.data, dtype=np.float64)
    G1.setdiag(0)
    G1.eliminate_zeros()
    indptr, indices = G1.indptr, G1.indices

    if method in ("FF", "first-fit"):
        from .amg_core import first_fit_coloring_native

        native = first_fit_coloring_native(G1)
        if native is not None:
            return native
        colors = np.full(n, -1, dtype=np.int32)
        for i in range(n):
            nbr_colors = set(colors[indices[indptr[i]:indptr[i + 1]]])
            c = 0
            while c in nbr_colors:
                c += 1
            colors[i] = c
        return colors

    if method in ("JP", "MIS", "LDF"):
        rng = np.random.default_rng(seed)
        if method == "LDF":
            weight = np.diff(indptr).astype(float) + rng.random(n)
        else:
            weight = rng.random(n)
        colors = np.full(n, -1, dtype=np.int32)
        tie = weight + np.arange(n) * 1e-12
        color = 0
        remaining = np.ones(n, dtype=bool)
        while remaining.any():
            w = np.where(remaining, tie, -np.inf)
            # per-row max over still-uncolored neighbors (segment reduce)
            wj = np.where(remaining[indices], w[indices], -np.inf)
            nbr_max = row_reduce(wj, indptr, np.maximum, -np.inf)
            winners = remaining & (w > nbr_max)
            if not winners.any():
                winners = np.zeros(n, dtype=bool)
                winners[int(np.argmax(w))] = True
            colors[winners] = color
            color += 1
            remaining &= ~winners
        return colors
    raise ValueError(f"unknown coloring method {method!r}")


def bellman_ford(G, seeds, maxiter=None):
    """Shortest distances (sum of edge weights) from a seed set.

    Returns (distances, nearest_seed).  Reference: graph.h:346.
    """
    G = _graph_csr(G)
    n = G.shape[0]
    seeds = np.asarray(seeds, dtype=np.int64)

    from .amg_core import bellman_ford_native

    native = bellman_ford_native(G, seeds)
    if native is not None:
        return native

    dist = np.full(n, np.inf)
    nearest = np.full(n, -1, dtype=np.int64)
    dist[seeds] = 0
    nearest[seeds] = seeds
    rows = np.repeat(np.arange(n), np.diff(G.indptr))
    cols = G.indices
    w = np.abs(G.data)
    maxiter = maxiter if maxiter is not None else n
    for _ in range(maxiter):
        cand = dist[rows] + w
        better = cand < dist[cols]
        if not better.any():
            break
        # resolve multiple updates to same col: use np.minimum.at then match
        new_dist = dist.copy()
        np.minimum.at(new_dist, cols, cand)
        changed = new_dist < dist
        # pick the nearest seed of the arg-min edge
        upd_cols = np.flatnonzero(changed)
        for c in upd_cols:
            e = np.flatnonzero((cols == c) & (np.isclose(cand, new_dist[c])))
            if e.size:
                nearest[c] = nearest[rows[e[0]]]
        dist = new_dist
    return dist, nearest


def lloyd_cluster(G, seeds, maxiter=10):
    """Lloyd clustering on a graph (reference graph.h:389 / graph.py:182).

    Returns (distances, clusters, seeds).
    """
    G = _graph_csr(G)
    n = G.shape[0]
    if np.isscalar(seeds):
        num = int(seeds)
        rng = np.random.default_rng(0)
        seeds = rng.choice(n, size=num, replace=False)
    seeds = np.asarray(seeds, dtype=np.int64).copy()

    dist = clusters = None
    for _ in range(maxiter):
        dist, nearest = bellman_ford(G, seeds)
        clusters = _seed_to_cluster(nearest, seeds)
        # recenter: new seed = node of max distance-from-boundary within
        # cluster; cheap proxy: the node farthest from current seed, then one
        # more BF pass from boundary. Use farthest-node heuristic.
        new_seeds = seeds.copy()
        for ci, s in enumerate(seeds):
            members = np.flatnonzero(clusters == ci)
            if members.size == 0:
                continue
            far = members[int(np.argmax(dist[members]))]
            # propagate back: seed moves to the in-cluster node maximizing
            # distance to the cluster boundary ~ midpoint; farthest works as
            # the classic 2-sweep heuristic
            new_seeds[ci] = far
        if np.array_equal(new_seeds, seeds):
            break
        seeds = new_seeds
    dist, nearest = bellman_ford(G, seeds)
    clusters = _seed_to_cluster(nearest, seeds)
    return dist, clusters, seeds


def _seed_to_cluster(nearest, seeds):
    lookup = -np.ones(int(max(nearest.max(), seeds.max())) + 1, dtype=np.int64)
    lookup[seeds] = np.arange(seeds.size)
    clusters = np.where(nearest >= 0, lookup[np.maximum(nearest, 0)], -1)
    return clusters


def breadth_first_search(G, seed):
    """BFS from ``seed``; returns (order, level).  Reference graph.h:607."""
    G = _graph_csr(G)
    n = G.shape[0]
    level = np.full(n, -1, dtype=np.int64)
    order = []
    level[seed] = 0
    frontier = [int(seed)]
    indptr, indices = G.indptr, G.indices
    while frontier:
        order.extend(frontier)
        nxt = []
        for i in frontier:
            for j in indices[indptr[i]:indptr[i + 1]]:
                if level[j] < 0:
                    level[j] = level[i] + 1
                    nxt.append(int(j))
        frontier = nxt
    return np.array(order, dtype=np.int64), level


def connected_components(G):
    """Label connected components.  Reference graph.h:661."""
    G = _graph_csr(G)
    ncomp, labels = sp.csgraph.connected_components(G, directed=False)
    return labels.astype(np.int64)


def pseudo_peripheral_node(G):
    """Find an approximate peripheral node (reference graph.py:359)."""
    G = _graph_csr(G)
    u = 0
    _, level = breadth_first_search(G, u)
    ecc = level.max()
    while True:
        cand = np.flatnonzero(level == ecc)
        deg = np.diff(G.indptr)
        v = cand[int(np.argmin(deg[cand]))]
        order, level_v = breadth_first_search(G, v)
        if level_v.max() <= ecc:
            return v, order, level_v
        u, level, ecc = v, level_v, level_v.max()


def symmetric_rcm(A):
    """Reverse Cuthill-McKee permutation applied symmetrically
    (reference graph.py:321).

    Examples
    --------
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.graph import symmetric_rcm
    >>> A = poisson((8, 8), format='csr')
    >>> B, perm = symmetric_rcm(A)
    >>> bool(B.nnz == A.nnz and perm.shape == (64,))
    True
    """
    from .util.utils import to_csr

    A = to_csr(A)
    perm = sp.csgraph.reverse_cuthill_mckee(A, symmetric_mode=True)
    return A[perm][:, perm], perm
