"""Aggregation methods for smoothed aggregation AMG.

Reference parity: pyamg/aggregation/aggregate.py (``standard_aggregation``
:20, ``naive_aggregation`` :106, ``lloyd_aggregation`` :189,
``pairwise_aggregation`` :285) and amg_core kernels
(smoothed_aggregation.h:122,245).

Returns (AggOp, Cpts): AggOp is the (n_nodes, n_aggregates) CSR indicator
matrix; Cpts are root/seed nodes where defined.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..util.utils import to_csr

__all__ = ["standard_aggregation", "naive_aggregation", "lloyd_aggregation",
           "pairwise_aggregation", "fit_aggop"]


def fit_aggop(labels, n_agg=None):
    """Build the CSR aggregate-indicator operator from a label vector
    (-1 = unaggregated)."""
    labels = np.asarray(labels, dtype=np.int64)
    n = labels.shape[0]
    if n_agg is None:
        n_agg = int(labels.max()) + 1 if (labels >= 0).any() else 0
    rows = np.flatnonzero(labels >= 0)
    A = sp.coo_matrix((np.ones(rows.size), (rows, labels[rows])),
                      shape=(n, n_agg)).tocsr()
    return A


def standard_aggregation(C):
    """Three-pass greedy aggregation over the strength graph
    (≙ smoothed_aggregation.h:122-221).

    Pass 1: node with all-unaggregated neighborhood seeds a new aggregate.
    Pass 2: unaggregated nodes join a neighboring aggregate.
    Pass 3: leftovers seed aggregates with their unaggregated neighbors.
    """
    C = to_csr(C)
    n = C.shape[0]
    indptr, indices = C.indptr, C.indices

    labels = np.full(n, -1, dtype=np.int64)
    roots = []
    next_agg = 0

    # pass 1
    for i in range(n):
        if labels[i] >= 0:
            continue
        nbrs = indices[indptr[i]:indptr[i + 1]]
        nbrs = nbrs[nbrs != i]
        if nbrs.size == 0:
            # isolated: skip (no aggregate, zero row in AggOp)
            labels[i] = -n - 1   # mark as permanently isolated
            continue
        if (labels[nbrs] == -1).all():
            labels[i] = next_agg
            labels[nbrs] = next_agg
            roots.append(i)
            next_agg += 1

    # pass 2: attach to a neighboring aggregate (first found)
    pass2_join = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        if labels[i] != -1:
            continue
        for j in indices[indptr[i]:indptr[i + 1]]:
            if labels[j] >= 0:
                pass2_join[i] = labels[j]
                break
    newly = pass2_join >= 0
    labels[newly] = pass2_join[newly]

    # pass 3
    for i in range(n):
        if labels[i] != -1:
            continue
        labels[i] = next_agg
        roots.append(i)
        for j in indices[indptr[i]:indptr[i + 1]]:
            if labels[j] == -1 and j != i:
                labels[j] = next_agg
        next_agg += 1

    labels[labels < -1] = -1
    AggOp = fit_aggop(labels, next_agg)
    return AggOp, np.array(roots, dtype=np.int64)


def naive_aggregation(C):
    """Single-pass greedy aggregation (≙ smoothed_aggregation.h:245)."""
    C = to_csr(C)
    n = C.shape[0]
    indptr, indices = C.indptr, C.indices

    labels = np.full(n, -1, dtype=np.int64)
    roots = []
    next_agg = 0
    for i in range(n):
        if labels[i] >= 0:
            continue
        labels[i] = next_agg
        roots.append(i)
        for j in indices[indptr[i]:indptr[i + 1]]:
            if labels[j] == -1:
                labels[j] = next_agg
        next_agg += 1
    AggOp = fit_aggop(labels, next_agg)
    return AggOp, np.array(roots, dtype=np.int64)


def lloyd_aggregation(C, ratio=0.03, distance="unit", maxiter=10, seed=0):
    """Lloyd-clustering aggregation (reference aggregate.py:274 →
    graph.h:389)."""
    from ..graph import lloyd_cluster

    C = to_csr(C)
    n = C.shape[0]
    if ratio <= 0 or ratio > 1:
        raise ValueError("ratio must be > 0.0 and <= 1.0")

    G = C.copy()
    if distance == "unit":
        G.data = np.ones_like(G.data, dtype=np.float64)
    elif distance == "abs":
        G.data = np.abs(G.data)
    elif distance == "inv":
        with np.errstate(divide="ignore"):
            G.data = 1.0 / np.abs(G.data)
    elif distance == "same":
        G = C
    elif distance == "sub":
        G.data = G.data - np.abs(G.data).min()
    else:
        raise ValueError(f"unrecognized distance metric {distance!r}")

    num_seeds = max(1, int(min(n, np.ceil(ratio * n))))
    rng = np.random.default_rng(seed)
    seeds = rng.choice(n, size=num_seeds, replace=False)
    _, clusters, seeds = lloyd_cluster(G, seeds, maxiter=maxiter)
    AggOp = fit_aggop(clusters, num_seeds)
    return AggOp, np.asarray(seeds)


def pairwise_aggregation(A, matchings=2, algorithm="drake",
                         get_weights=None, **kwargs):
    """Pairwise (matching-based) aggregation, fork feature
    (reference aggregate.py:285).  ``matchings`` rounds of maximum weighted
    matching are composed for a coarsening factor of ~2^matchings.
    """
    from .matching import drake_matching, preis_matching, notay_matching

    A = to_csr(A)
    n = A.shape[0]
    AggTotal = None
    Ak = A
    for _ in range(int(matchings)):
        if algorithm == "drake":
            pairs = drake_matching(Ak, **kwargs)
        elif algorithm == "preis":
            pairs = preis_matching(Ak, **kwargs)
        elif algorithm == "notay":
            pairs = notay_matching(Ak, **kwargs)
        else:
            raise ValueError(f"unknown matching algorithm {algorithm!r}")
        labels = _pairs_to_labels(pairs, Ak.shape[0])
        Agg = fit_aggop(labels)
        AggTotal = Agg if AggTotal is None else (AggTotal @ Agg).tocsr()
        Ak = (Agg.T @ Ak @ Agg).tocsr()
    return AggTotal.tocsr(), None


def _pairs_to_labels(pairs, n):
    """pairs: (n,) partner index or -1.  Each matched pair and each singleton
    becomes one aggregate."""
    labels = np.full(n, -1, dtype=np.int64)
    next_agg = 0
    for i in range(n):
        if labels[i] >= 0:
            continue
        j = pairs[i]
        labels[i] = next_agg
        if j >= 0 and labels[j] < 0:
            labels[j] = next_agg
        next_agg += 1
    return labels
