"""Reference pyamg standalone GMRES/BiCGStab on the gallery set
(BASELINE config 5's Krylov sweep), CPU f64, tol 1e-10, host-verified.

Consumes /tmp/krylov_gallery_problems.npz exported by export_krylov_problems
in this directory (the EXACT matrices suite.py uses — our gallery generates
recirc_flow itself, so matrices must be shared, not rebuilt), writes
/tmp/ref_krylov.json.
"""
import json
import time

import numpy as np
import scipy.sparse as sp

import ref_harness  # noqa: F401
from pyamg.krylov import gmres, bicgstab

data = np.load("/tmp/krylov_gallery_problems.npz", allow_pickle=False)
names = [n[:-len("_indptr")] for n in data.files if n.endswith("_indptr")]

out = {}
for name in sorted(names):
    A = sp.csr_matrix((data[f"{name}_data"], data[f"{name}_indices"],
                       data[f"{name}_indptr"]),
                      shape=tuple(data[f"{name}_shape"]))
    rng = np.random.default_rng(0)
    b = np.asarray(A @ rng.random(A.shape[0]))
    entry = {"n": int(A.shape[0])}
    for meth, fn, kw in [("gmres", gmres, {"restrt": None, "maxiter": 800}),
                         ("bicgstab", bicgstab, {"maxiter": 20000})]:
        res = []
        t0 = time.time()
        x, info = fn(A, b, tol=1e-10, residuals=res, **kw)
        t = time.time() - t0
        rr = float(np.linalg.norm(b - A @ np.asarray(x).ravel())
                   / np.linalg.norm(b))
        entry[f"{meth}_s"] = round(t, 4)
        entry[f"{meth}_iters"] = len(res) - 1
        entry[f"{meth}_relres"] = rr
    out[name] = entry
    print(name, entry, flush=True)

json.dump(out, open("/tmp/ref_krylov.json", "w"), indent=1)
print("DONE")
