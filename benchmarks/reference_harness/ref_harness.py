"""Import shim for the 2013-era reference pyamg under modern numpy/scipy."""
import sys
import types

import numpy as np
import numpy.testing
import scipy
import scipy.sparse
import scipy.sparse.linalg


# numpy 2.x removals
if not hasattr(numpy.testing, "Tester"):
    class _Tester:
        def __init__(self, *a, **k):
            pass

        def test(self, *a, **k):
            pass

        def bench(self, *a, **k):
            pass
    numpy.testing.Tester = _Tester

for name, repl in [("float", float), ("int", int), ("bool", bool),
                   ("complex", complex), ("object", object),
                   ("str", str), ("long", int), ("unicode", str)]:
    if not hasattr(np, name):
        setattr(np, name, repl)
if not hasattr(np, "float_"):
    np.float_ = np.float64
if not hasattr(np, "complex_"):
    np.complex_ = np.complex128
if not hasattr(np, "longfloat"):
    np.longfloat = np.longdouble
if not hasattr(np, "NaN"):
    np.NaN = np.nan
if not hasattr(np, "Inf"):
    np.Inf = np.inf
if not hasattr(np, "alltrue"):
    np.alltrue = lambda a, *args, **kw: np.all(a, *args, **kw)
if not hasattr(np, "sometrue"):
    np.sometrue = lambda a, *args, **kw: np.any(a, *args, **kw)
if not hasattr(np, "rank"):
    np.rank = lambda a: np.ndim(a)
if not hasattr(np, "mat"):
    np.mat = np.asmatrix

# scipy removals
if not hasattr(scipy, "rand"):
    scipy.rand = lambda *shape: np.random.rand(*shape)
if not hasattr(scipy, "randn"):
    scipy.randn = lambda *shape: np.random.randn(*shape)
if not hasattr(scipy, "real"):
    scipy.real = np.real
if not hasattr(scipy, "imag"):
    scipy.imag = np.imag
if not hasattr(scipy, "dot"):
    scipy.dot = np.dot
if not hasattr(scipy, "ravel"):
    scipy.ravel = np.ravel
if not hasattr(scipy, "hstack"):
    scipy.hstack = np.hstack
if not hasattr(scipy, "vstack"):
    scipy.vstack = np.vstack
if not hasattr(scipy, "zeros"):
    scipy.zeros = np.zeros
if not hasattr(scipy, "ones"):
    scipy.ones = np.ones
if not hasattr(scipy, "array"):
    scipy.array = np.array
if not hasattr(scipy, "asarray"):
    scipy.asarray = np.asarray
if not hasattr(scipy, "empty"):
    scipy.empty = np.empty
if not hasattr(scipy, "arange"):
    scipy.arange = np.arange
if not hasattr(scipy, "eye"):
    scipy.eye = np.eye
if not hasattr(scipy, "finfo"):
    scipy.finfo = np.finfo
if not hasattr(scipy, "sqrt"):
    scipy.sqrt = np.sqrt
if not hasattr(scipy, "abs"):
    scipy.abs = np.abs
if not hasattr(scipy, "log2"):
    scipy.log2 = np.log2
if not hasattr(scipy, "ceil"):
    scipy.ceil = np.ceil
if not hasattr(scipy, "inf"):
    scipy.inf = np.inf
if not hasattr(scipy, "pi"):
    scipy.pi = np.pi
if not hasattr(np, "deprecate"):
    def _deprecate(fn=None, **kw):
        if fn is None:
            return lambda f: f
        return fn
    np.deprecate = _deprecate

if not hasattr(np, "find_common_type"):
    def _fct(array_types, scalar_types):
        types = list(array_types) + list(scalar_types)
        return np.result_type(*types) if types else np.float64
    np.find_common_type = _fct

try:
    import scipy.sparse.sputils  # noqa: F401
    _HAS_SPUTILS = hasattr(scipy.sparse.sputils, "upcast")
except ImportError:
    _HAS_SPUTILS = False
if not _HAS_SPUTILS:
    from scipy.sparse import _sputils as _spu
    sys.modules["scipy.sparse.sputils"] = _spu
    scipy.sparse.sputils = _spu

import builtins
if not hasattr(builtins, 'basestring'):
    builtins.basestring = str
if not hasattr(builtins, 'xrange'):
    builtins.xrange = range

import scipy.linalg
if not hasattr(scipy.linalg, "pinv2"):
    scipy.linalg.pinv2 = scipy.linalg.pinv

try:
    from scipy.sparse.linalg import _isolve as _iso
    from scipy.sparse.linalg._isolve import utils as _real_utils

    def _make_system(A, M, x0, b, xtype=None):
        out = _real_utils.make_system(A, M, x0, b)
        if len(out) == 4:                    # modern scipy: no postprocess
            A2, M2, x2, b2 = out
            return A2, M2, x2, b2, (lambda v: v)
        return out

    _iso_utils = types.SimpleNamespace(make_system=_make_system)
except ImportError:
    _iso = types.SimpleNamespace()
    _iso_utils = types.SimpleNamespace()
scipy.sparse.linalg.isolve = _iso
sys.modules["scipy.sparse.linalg.isolve"] = _iso
sys.modules["scipy.sparse.linalg.isolve.utils"] = _iso_utils

# old sparse-matrix attribute API
_spm = scipy.sparse.spmatrix
if not hasattr(_spm, "H"):
    _spm.H = property(lambda self: self.conjugate().transpose())
if not hasattr(_spm, "A"):
    _spm.A = property(lambda self: self.toarray())

sys.path.insert(0, "/tmp/refbuild")
import pyamg  # noqa: E402,F401


# catch-all: the old fork uses many scipy.<numpy-fn> aliases (PEP 562)
def _scipy_getattr(name):
    if hasattr(np, name):
        return getattr(np, name)
    raise AttributeError(name)
scipy.__getattr__ = _scipy_getattr


# modern scipy: spmatrix.sum() routes through asmatrix(_todata(self)),
# which explodes for BSR (3-D block data cannot view as np.matrix).  The
# reference's energy-min path calls .sum() on BSR elementwise products
# (aggregation/smooth.py cg_prolongation_smoothing).  Sum via CSR —
# identical entries, container-level reassociation only.
import scipy.sparse as _sp

if hasattr(_sp, "bsr_matrix"):
    def _bsr_sum(self, axis=None, dtype=None, out=None):
        return self.tocsr().sum(axis=axis, dtype=dtype, out=out)
    _sp.bsr_matrix.sum = _bsr_sum
