"""Hierarchy checkpoint/resume.

The reference has no persistence (SURVEY.md §5 "Checkpoint / resume: None");
here a hierarchy is a pytree of host CSR twins + configuration, so it
serializes to a single ``.npz`` and reloads into a fully-working solver
(device operators and smoothers are rebuilt on load).
"""

from __future__ import annotations

import json

import numpy as np
import scipy.sparse as sp

__all__ = ["save_hierarchy", "load_hierarchy"]


def _pack_csr(prefix, M, store):
    store[f"{prefix}_data"] = M.data
    store[f"{prefix}_indices"] = M.indices
    store[f"{prefix}_indptr"] = M.indptr
    store[f"{prefix}_shape"] = np.asarray(M.shape)


def _unpack_csr(prefix, store):
    return sp.csr_matrix(
        (store[f"{prefix}_data"], store[f"{prefix}_indices"],
         store[f"{prefix}_indptr"]),
        shape=tuple(store[f"{prefix}_shape"]))


def save_hierarchy(ml, path):
    """Serialize a MultilevelSolver to ``path`` (.npz)."""
    store = {}
    meta = {
        "n_levels": len(ml.levels),
        "coarse_solver": ml.coarse_solver_spec
        if isinstance(ml.coarse_solver_spec, (str, list))
        else list(ml.coarse_solver_spec)
        if isinstance(ml.coarse_solver_spec, tuple) else "pinv",
        "smoothers": getattr(ml, "_smoother_config",
                             ("gauss_seidel", "gauss_seidel")),
        "grids": [list(getattr(l, "grid", None) or [])
                  for l in ml.levels],
        "blocksizes": [int(getattr(l, "blocksize", 1)) for l in ml.levels],
    }
    store["meta"] = np.frombuffer(
        json.dumps(meta, default=str).encode(), dtype=np.uint8)
    for i, lvl in enumerate(ml.levels):
        # device-built hierarchies (e.g. structured_sa_setup) have no host
        # twins; materialize them lazily so every hierarchy serializes
        if not hasattr(lvl, "A_csr"):
            lvl.A_csr = lvl.A.to_scipy()
        if not hasattr(lvl, "P_csr") and getattr(lvl, "P", None) is not None:
            lvl.P_csr = lvl.P.to_scipy()
            lvl.R_csr = lvl.R.to_scipy()
        _pack_csr(f"L{i}_A", lvl.A_csr, store)
        if hasattr(lvl, "P_csr"):
            _pack_csr(f"L{i}_P", lvl.P_csr, store)
            _pack_csr(f"L{i}_R", lvl.R_csr, store)
        if getattr(lvl, "B", None) is not None:
            store[f"L{i}_B"] = np.asarray(lvl.B)
    np.savez_compressed(path, **store)


def load_hierarchy(path):
    """Load a hierarchy saved by :func:`save_hierarchy` into a working
    MultilevelSolver (device operators rebuilt)."""
    from ..multilevel import MultilevelSolver, Level
    from ..relaxation.smoothing import change_smoothers
    from ..sparse import device_operator

    store = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(store["meta"]).decode())

    levels = []
    for i in range(meta["n_levels"]):
        lvl = Level()
        lvl.A_csr = _unpack_csr(f"L{i}_A", store)
        lvl.blocksize = meta["blocksizes"][i]
        grid = meta["grids"][i]
        lvl.grid = tuple(grid) if grid else None
        if f"L{i}_P_data" in store:
            lvl.P_csr = _unpack_csr(f"L{i}_P", store)
            lvl.R_csr = _unpack_csr(f"L{i}_R", store)
        if f"L{i}_B" in store:
            lvl.B = store[f"L{i}_B"]
        lvl.A = device_operator(lvl.A_csr)
        if hasattr(lvl, "P_csr"):
            lvl.P = device_operator(lvl.P_csr)
            lvl.R = device_operator(lvl.R_csr)
        levels.append(lvl)

    cs = meta["coarse_solver"]
    if isinstance(cs, list):
        cs = (cs[0], cs[1]) if len(cs) == 2 else cs[0]
    ml = MultilevelSolver(levels, coarse_solver=cs)

    pre, post = meta["smoothers"]

    def _norm(s):
        if isinstance(s, list):
            if len(s) == 2 and isinstance(s[0], str):
                return (s[0], s[1])
            return [_norm(v) for v in s]
        return s

    change_smoothers(ml, _norm(pre), _norm(post))
    return ml
