"""Regenerate tests/fixtures/rs_reference_fingerprints.json from the
REFERENCE pyamg (built at /tmp/refbuild, imported via ref_harness shim).

The fixture pins the classical-AMG hierarchy STRUCTURE bit-exactly
(C/F splitting vectors, P sparsity patterns, level sizes) plus data
checksums to tolerance.  tests/test_parity.py asserts our builder
reproduces the structure exactly — traversal-order drift in
rs_cf_splitting (amg_core/core.cpp) or interpolation-pattern changes fail
the test.  Measured: our data agrees with the reference to <1e-15 ULP
noise (arithmetic-order differences in the interpolation sums), so data
is pinned via P_data_sum at rtol 1e-9, not by hash.

Run:  python benchmarks/reference_harness/gen_fingerprints.py
"""
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import ref_harness  # noqa: F401  (import shim; also puts pyamg on path)
import pyamg  # noqa: E402
from pyamg.gallery import poisson, stencil_grid  # noqa: E402
from pyamg.gallery.diffusion import diffusion_stencil_2d  # noqa: E402


def _sha(*arrays):
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def splitting_sha(s):
    return _sha(np.asarray(s, dtype=np.int32))


def struct_sha(X):
    X = X.tocsr()
    X.sort_indices()
    return _sha(np.asarray(X.indptr, dtype=np.int64),
                np.asarray(X.indices, dtype=np.int64))


def fingerprint(ml):
    levels = []
    for i, lvl in enumerate(ml.levels):
        A = lvl.A.tocsr()
        entry = {"n": int(A.shape[0]), "nnz": int(A.nnz),
                 "A_struct_sha": struct_sha(A)}
        if i < len(ml.levels) - 1:
            P = lvl.P.tocsr()
            entry.update({
                "n_C": int(P.shape[1]),
                "P_shape": [int(P.shape[0]), int(P.shape[1])],
                "P_nnz": int(P.nnz),
                "P_struct_sha": struct_sha(P),
                "P_data_sum": float(np.asarray(P.sum())),
            })
            if hasattr(lvl, "splitting"):
                entry["splitting_sha"] = splitting_sha(lvl.splitting)
        levels.append(entry)
    return {"opc": round(float(ml.operator_complexity()), 6),
            "gc": round(float(ml.grid_complexity()), 6),
            "levels": levels}


def main():
    out = {}

    A = poisson((500, 500), format="csr")
    ml = pyamg.ruge_stuben_solver(A, keep=True)
    out["poisson_500"] = fingerprint(ml)

    sten = diffusion_stencil_2d(epsilon=0.01, theta=np.pi / 4, type="FD")
    A = stencil_grid(sten, (128, 128), format="csr")
    ml = pyamg.ruge_stuben_solver(
        A, strength=("evolution", {"k": 2, "epsilon": 4.0}), keep=True)
    out["aniso_128_evolution"] = fingerprint(ml)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "..", "tests", "fixtures",
                        "rs_reference_fingerprints.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    for name, v in out.items():
        print(name, "levels:", [l["n"] for l in v["levels"]],
              "opc:", v["opc"])


if __name__ == "__main__":
    main()
