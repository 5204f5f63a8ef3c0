"""Curated example problems.

Reference parity: pyamg/gallery/example.py (``load_example``).  The reference
ships nine MATLAB ``.mat`` datasets (airfoil, bar, knot, unit_square,
unit_cube, recirc_flow, helmholtz_2D, local_disc_galerkin_diffusion).  Those
binary assets are not vendored here; ``load_example`` loads them from a data
directory if present (``PYAMG_TPU_EXAMPLE_DATA`` or ``data_dir=``), and a set
of *generated* equivalents covers the structurally similar cases so tests and
demos run self-contained.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["load_example", "EXAMPLE_NAMES"]

EXAMPLE_NAMES = [
    "airfoil", "bar", "knot", "unit_square", "unit_cube",
    "recirc_flow", "helmholtz_2D", "local_disc_galerkin_diffusion",
]

_GENERATED = {}


def _register(name):
    def deco(fn):
        _GENERATED[name] = fn
        return fn
    return deco


@_register("unit_square")
def _unit_square():
    from .mesh import regular_triangle_mesh
    from .elasticity import _p1_local  # noqa: F401  (mesh helpers nearby)
    import scipy.sparse as sp

    vertices, elements = regular_triangle_mesh(30, 30)
    # P1 Laplacian on the triangle mesh
    n = vertices.shape[0]
    rows, cols, vals = [], [], []
    for tri in elements:
        V = vertices[tri]
        T = (V[1:] - V[0]).T
        area = abs(np.linalg.det(T)) / 2.0
        Tinv = np.linalg.inv(T)
        g = np.zeros((3, 2))
        g[1:] = Tinv          # ∇φ_k = row k-1 of T^{-1}
        g[0] = -g[1:].sum(axis=0)
        Ke = area * (g @ g.T)
        rows.append(np.repeat(tri, 3))
        cols.append(np.tile(tri, 3))
        vals.append(Ke.ravel())
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    return {"A": A, "vertices": vertices, "elements": elements,
            "B": np.ones((n, 1))}


@_register("unit_cube")
def _unit_cube():
    from .laplacian import poisson

    A = poisson((12, 12, 12), format="csr")
    return {"A": A, "B": np.ones((A.shape[0], 1))}


@_register("helmholtz_2D")
def _helmholtz_2d():
    from .laplacian import poisson

    n = 40
    A = poisson((n, n), format="csr").astype(complex)
    h = 1.0 / (n + 1)
    # indefinite shift: -Laplacian/h^2 - k^2 I with ~8 points per wavelength
    k = 2 * np.pi / (8 * h)
    import scipy.sparse as sp

    A = A / h**2 - (k**2) * sp.eye(A.shape[0], dtype=complex, format="csr")
    return {"A": A.tocsr(), "B": np.ones((A.shape[0], 1), dtype=complex)}


@_register("recirc_flow")
def _recirc_flow():
    """Nonsymmetric convection-diffusion with recirculating wind field."""
    import scipy.sparse as sp

    n = 40
    h = 1.0 / (n + 1)
    xs = (np.arange(n) + 1) * h
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    # wind (b1, b2) = (y - 1/2, 1/2 - x): rotation about the center
    b1 = (Y - 0.5).reshape(-1)
    b2 = (0.5 - X).reshape(-1)
    eps = 1e-2

    N = n * n
    idx = np.arange(N)
    ix, iy = idx // n, idx % n
    rows, cols, vals = [idx], [idx], [np.full(N, 4.0 * eps / h**2)]

    def add(mask, shift, v):
        r = idx[mask]
        rows.append(r)
        cols.append(r + shift)
        vals.append(v[mask] if np.ndim(v) else np.full(r.size, v))

    # diffusion -eps Δ + upwinded convection b·∇
    add(ix + 1 < n, n, -eps / h**2 + np.minimum(b1, 0) / h)
    add(ix - 1 >= 0, -n, -eps / h**2 - np.maximum(b1, 0) / h)
    add(iy + 1 < n, 1, -eps / h**2 + np.minimum(b2, 0) / h)
    add(iy - 1 >= 0, -1, -eps / h**2 - np.maximum(b2, 0) / h)
    # upwind scheme adds |b|/h to the diagonal
    diag_extra = (np.abs(b1) + np.abs(b2)) / h
    rows.append(idx)
    cols.append(idx)
    vals.append(diag_extra)

    A = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(N, N)).tocsr()
    return {"A": A, "B": np.ones((N, 1))}


@_register("bar")
def _bar():
    from .elasticity import linear_elasticity

    A, B = linear_elasticity((40, 10))
    return {"A": A.tocsr(), "B": B}


@_register("airfoil")
def _airfoil():
    """Unstructured-mesh stand-in: P1 Laplacian on a Delaunay triangulation
    of an annulus (a hole in the domain, like a wing section)."""
    import scipy.sparse as sp
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(7)
    # annulus point cloud: inner boundary ring + outer ring + interior
    t = np.linspace(0, 2 * np.pi, 48, endpoint=False)
    inner = 0.3 * np.stack([np.cos(t), 0.4 * np.sin(t)], axis=1)
    outer = 1.5 * np.stack([np.cos(t), np.sin(t)], axis=1)
    pts = rng.uniform(-1.5, 1.5, size=(900, 2))
    r = np.sqrt(pts[:, 0] ** 2 + (pts[:, 1] / 0.4) ** 2)
    keep = (r > 0.34) & (np.linalg.norm(pts, axis=1) < 1.45)
    vertices = np.concatenate([inner, outer, pts[keep]], axis=0)
    tri = Delaunay(vertices)
    # drop triangles inside the hole (centroid test)
    cent = vertices[tri.simplices].mean(axis=1)
    rc = np.sqrt(cent[:, 0] ** 2 + (cent[:, 1] / 0.4) ** 2)
    elements = tri.simplices[rc > 0.3]

    n = vertices.shape[0]
    rows, cols, vals = [], [], []
    for trie in elements:
        V = vertices[trie]
        T = (V[1:] - V[0]).T
        det = np.linalg.det(T)
        if abs(det) < 1e-12:
            continue
        area = abs(det) / 2.0
        g = np.zeros((3, 2))
        g[1:] = np.linalg.inv(T)
        g[0] = -g[1:].sum(axis=0)
        Ke = area * (g @ g.T)
        rows.append(np.repeat(trie, 3))
        cols.append(np.tile(trie, 3))
        vals.append(Ke.ravel())
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    A = A + 1e-8 * sp.eye(n, format="csr")   # remove the constant nullspace
    return {"A": A, "vertices": vertices, "elements": elements,
            "B": np.ones((n, 1))}


def load_example(name, data_dir=None):
    """Load one of the curated example problems as a dict with key 'A' (and
    typically 'B', 'vertices', 'elements' where applicable).

    Looks for ``<name>.mat`` in ``data_dir`` (or $PYAMG_TPU_EXAMPLE_DATA),
    else falls back to the generated equivalent if one exists.
    """
    if name not in EXAMPLE_NAMES and name not in _GENERATED:
        raise ValueError(
            f"unknown example {name!r}; known: {sorted(set(EXAMPLE_NAMES) | set(_GENERATED))}")

    search = []
    if data_dir:
        search.append(data_dir)
    env = os.environ.get("PYAMG_TPU_EXAMPLE_DATA")
    if env:
        search.append(env)
    search.append(os.path.join(os.path.dirname(__file__), "example_data"))

    for d in search:
        path = os.path.join(d, name + ".mat")
        if os.path.isfile(path):
            from scipy.io import loadmat

            data = loadmat(path, struct_as_record=True)
            return {k: v for k, v in data.items() if not k.startswith("__")}

    if name in _GENERATED:
        return _GENERATED[name]()

    raise FileNotFoundError(
        f"no .mat data found for example {name!r} (searched {search}) and no "
        f"generated equivalent is available")
