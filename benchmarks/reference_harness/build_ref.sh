#!/bin/bash
# Build the reference pyamg fork into /tmp/refbuild (see README.md steps).
# Mechanical modernization only — no numeric behavior changes.
set -e

DST=/tmp/refbuild
if [ -e "$DST/pyamg/amg_core/_amg_core.so" ] && \
   python -c "import sys; sys.path.insert(0,'$DST'); import os; os.chdir('/tmp'); import importlib, benchmarks" 2>/dev/null; then
  :
fi
rm -rf "$DST"
mkdir -p "$DST"
cp -r /root/reference/pyamg "$DST/pyamg"
chmod -R u+w "$DST"

cd "$DST"

# 2. compile the checked-in SWIG wrapper
NPINC=$(python -c "import numpy; print(numpy.get_include())")
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
g++ -O2 -shared -fPIC -std=c++14 pyamg/amg_core/amg_core_wrap.cxx \
    -I"$NPINC" -I"$PYINC" -o pyamg/amg_core/_amg_core.so

# 3. py2 -> py3 mechanical fixes
python -m lib2to3 -f print -f except -f has_key -w pyamg/ >/dev/null 2>&1

python - <<'EOF'
import io, os, re

def patch(path, old, new, count=1):
    with io.open(path) as f:
        s = f.read()
    if old not in s:
        if new in s:
            return          # already patched
        raise SystemExit(f"pattern not found in {path}: {old!r}")
    with io.open(path, "w") as f:
        f.write(s.replace(old, new, count))

root = "pyamg"

# (a) imp-based SWIG loader -> plain import of the sibling .so
patch(os.path.join(root, "amg_core", "amg_core.py"),
      """from sys import version_info
if version_info >= (2, 6, 0):
    def swig_import_helper():
        from os.path import dirname
        import imp
        fp = None
        try:
            fp, pathname, description = imp.find_module('_amg_core', [dirname(__file__)])
        except ImportError:
            import _amg_core
            return _amg_core
        if fp is not None:
            try:
                _mod = imp.load_module('_amg_core', fp, pathname, description)
            finally:
                fp.close()
            return _mod
    _amg_core = swig_import_helper()
    del swig_import_helper
else:
    import _amg_core
del version_info""",
      "from . import _amg_core")

# (b) py2 implicit relative imports: any `from X import` / `import X`
#     where X is a sibling .py module in the same package directory
for dirpath, _dirs, files in os.walk(root):
    sibs = {fn[:-3] for fn in files if fn.endswith(".py")
            and fn != "__init__.py"}
    for fn in files:
        if not fn.endswith(".py"):
            continue
        p = os.path.join(dirpath, fn)
        with io.open(p) as f:
            s = f.read()
        s2 = s
        for sib in sibs:
            s2 = re.sub(r"(?m)^from %s import" % re.escape(sib),
                        "from .%s import" % sib, s2)
            s2 = re.sub(r"(?m)^import %s$" % re.escape(sib),
                        "from . import %s" % sib, s2)
        if s2 != s:
            with io.open(p, "w") as f:
                f.write(s2)

# (c) removed scipy.linalg.calc_lwork in krylov/_gmres.py-era code and
#     util/linalg.py (pinv_array's gelss workspace query; replace with the
#     LAPACK *gelss minimum-workspace formula — square m x m blocks, m RHS:
#     3m + max(2m, m, nrhs) = 5m, padded)
for rel, repls in [
    (("krylov", "_gmres.py"),
     [("from scipy.linalg import calc_lwork", "calc_lwork = None")]),
    (("util", "linalg.py"),
     [("from scipy.linalg import calc_lwork", "calc_lwork = None"),
      ("lwork = calc_lwork.gelss(gelss.prefix, m, m, m)[1]",
       "lwork = 12 * m + 128")]),
]:
    p = os.path.join(root, *rel)
    if os.path.exists(p):
        with io.open(p) as f:
            s = f.read()
        s2 = s
        for old, new in repls:
            s2 = s2.replace(old, new)
        if s2 != s:
            with io.open(p, "w") as f:
                f.write(s2)

# (c2) modern numpy requires tuple (not list) advanced indices
p = os.path.join(root, "gallery", "stencil.py")
if os.path.exists(p):
    with io.open(p) as f:
        s = f.read()
    s2 = s.replace("diag[s] = 0", "diag[tuple(s)] = 0")
    if s2 != s:
        with io.open(p, "w") as f:
            f.write(s2)

# (d) setup-generated modules the source tree lacks
with io.open(os.path.join(root, "__config__.py"), "w") as f:
    f.write("def show():\n    pass\n")
if not os.path.exists(os.path.join(root, "version.py")):
    with io.open(os.path.join(root, "version.py"), "w") as f:
        f.write("version = '2.0.x-reference'\ngit_revision = 'reference'\n"
                "release = True\nshort_version = version\n")

print("patched")
EOF

cd /root/repo/benchmarks/reference_harness
python - <<'EOF'
import ref_harness  # noqa
import pyamg
import numpy as np
from pyamg.gallery import poisson
A = poisson((50, 50), format='csr')
ml = pyamg.ruge_stuben_solver(A)
b = np.random.default_rng(0).standard_normal(A.shape[0])
res = []
x = ml.solve(b, tol=1e-8, residuals=res)
rr = float(np.linalg.norm(b - A @ x) / np.linalg.norm(b))
assert rr < 1e-7, rr
print("reference build OK, relres", rr)
EOF
