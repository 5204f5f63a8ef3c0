"""Weighted graph matchings for pairwise aggregation (fork feature).

Reference parity: pyamg/aggregation/matching.py (``preis_matching_1999`` :94,
``drake_matching`` :151 → smoothed_aggregation.h:1610, ``notay_matching_2010``
:208 → smoothed_aggregation.h:1885).

Each returns a partner array: partner[i] = j if {i, j} matched, else -1.

Examples
--------
>>> import numpy as np
>>> from pyamg_tpu.gallery import poisson
>>> from pyamg_tpu.aggregation.matching import drake_matching
>>> A = poisson((6, 6), format='csr')
>>> p = np.asarray(drake_matching(A))
>>> bool(((p == -1) | (p[p] == np.arange(p.size))).all())  # involution
True
"""

from __future__ import annotations

import numpy as np

from ..util.utils import to_csr

__all__ = ["drake_matching", "preis_matching", "notay_matching",
           "preis_matching_1999", "notay_matching_2010"]


def drake_matching(A, weights=None, **kwargs):
    """Drake & Hougardy (2003) ½-approximation: grow two alternating path
    covers from unmatched vertices, keep the heavier one
    (≙ smoothed_aggregation.h:1610,1744)."""
    A = to_csr(A)
    from ..amg_core import drake_matching_native

    native = drake_matching_native(A, weights)
    if native is not None:
        return native
    n = A.shape[0]
    indptr, indices = A.indptr, A.indices
    w = np.abs(A.data) if weights is None else np.asarray(weights)

    def grow(start_order):
        used = np.zeros(n, dtype=bool)
        match = np.full(n, -1, dtype=np.int64)
        total = 0.0
        for s in start_order:
            if used[s]:
                continue
            # walk a path greedily by heaviest remaining edge, alternately
            # adding edges to the matching
            x = s
            take = True
            while True:
                used[x] = True
                best_j, best_w = -1, -1.0
                for k in range(indptr[x], indptr[x + 1]):
                    j = indices[k]
                    if j != x and not used[j] and w[k] > best_w:
                        best_j, best_w = j, w[k]
                if best_j < 0:
                    break
                if take:
                    match[x] = best_j
                    match[best_j] = x
                    total += best_w
                take = not take
                x = best_j
        return match, total

    m1, t1 = grow(range(n))
    m2, t2 = grow(range(n - 1, -1, -1))
    return m1 if t1 >= t2 else m2


def preis_matching(A, weights=None, **kwargs):
    """Preis (1999) locally-heaviest-edge ½-approximation matching
    (reference matching.py:94, pure Python there too)."""
    A = to_csr(A)
    n = A.shape[0]
    indptr, indices = A.indptr, A.indices
    w = np.abs(A.data) if weights is None else np.asarray(weights)

    match = np.full(n, -1, dtype=np.int64)
    matched = np.zeros(n, dtype=bool)

    # simple locally-heaviest strategy: repeatedly take the heaviest edge
    # whose endpoints are both free, restricted to local maxima
    order = np.argsort(-w)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    for e in order:
        i, j = rows[e], indices[e]
        if i == j or matched[i] or matched[j]:
            continue
        match[i] = j
        match[j] = i
        matched[i] = matched[j] = True
    return match


def notay_matching(A, beta=0.25, **kwargs):
    """Notay (2010) pairwise aggregation by strong negative coupling
    (reference matching.py:208, ≙ smoothed_aggregation.h:1885).

    Nodes pair with their strongest negative neighbor; couplings weaker than
    ``beta * max-negative-coupling`` are ignored.
    """
    A = to_csr(A)
    n = A.shape[0]
    indptr, indices, data = A.indptr, A.indices, np.real(A.data)

    match = np.full(n, -1, dtype=np.int64)
    matched = np.zeros(n, dtype=bool)

    # process nodes by ascending "degree of freedom" (here: row size)
    order = np.argsort(np.diff(indptr))
    for i in order:
        if matched[i]:
            continue
        best_j, best_v = -1, 0.0
        neg_min = 0.0
        for k in range(indptr[i], indptr[i + 1]):
            j = indices[k]
            if j != i and data[k] < neg_min:
                neg_min = data[k]
        for k in range(indptr[i], indptr[i + 1]):
            j = indices[k]
            if j == i or matched[j]:
                continue
            v = data[k]
            if v < beta * neg_min and v < best_v:
                best_j, best_v = j, v
        if best_j >= 0:
            match[i] = best_j
            match[best_j] = i
            matched[i] = matched[best_j] = True
        matched[i] = True
    return match


# reference-named aliases
preis_matching_1999 = preis_matching
notay_matching_2010 = notay_matching
