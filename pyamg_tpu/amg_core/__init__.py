"""Native host kernels for setup-phase graph algorithms (ctypes-bound C++).

Role of the reference's pyamg/amg_core SWIG extension (SURVEY.md L0) for the
parts that stay on the host: sequential coarsening/graph algorithms.  The
library is compiled on first use with g++ and cached next to the source;
every binding has a pure-numpy fallback so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

__all__ = ["have_native", "rs_cf_splitting", "standard_aggregation_native",
           "naive_aggregation_native", "gauss_seidel_indexed_native",
           "gauss_seidel_sweeps_native",
           "gauss_seidel_kaczmarz_native", "bellman_ford_native",
           "bfs_levels_native", "drake_matching_native",
           "masked_spgemm_native", "bsr_gauss_seidel_native",
           "identity_minus_scaled_native", "identity_minus_colscaled_native",
           "evolution_epilogue_native",
           "direct_interpolation_native", "classical_strength_native",
           "first_fit_coloring_native", "constraint_project_native",
           "pattern_gram_native", "masked_spgemm_bsr_native",
           "constraint_project_bsr_native", "pattern_gram_bsr_native",
           "thomas_lines_native"]

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "libamg_core.so")
_SRC = os.path.join(_HERE, "core.cpp")

_lib = None


def _build():
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(base[:1] + ["-fopenmp"] + base[1:],
                       check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(base, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        _lib = ctypes.CDLL(_SO)
        _declare(_lib)
    except Exception as e:  # pragma: no cover - toolchain missing
        warnings.warn(f"amg_core native build unavailable ({e}); "
                      "using numpy fallbacks")
        _lib = False
    return _lib


def have_native() -> bool:
    return bool(_load())


_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_I = ctypes.c_int64
_D = ctypes.c_double


def _declare(lib):
    lib.rs_cf_splitting.argtypes = [_I, _i64p, _i64p, _i64p, _i64p, _i32p]
    lib.rs_cf_splitting_i32.argtypes = [_I, _i32p, _i32p, _i32p, _i32p,
                                        _i32p]
    lib.standard_aggregation_i32.argtypes = [_I, _i32p, _i32p, _i64p,
                                             _i64p, ctypes.POINTER(_I)]
    lib.gauss_seidel_sweeps_i32.argtypes = [_I, _i32p, _i32p, _f64p,
                                            _f64p, _f64p, _I, _I]
    lib.gauss_seidel_kaczmarz_i32.argtypes = [_I, _i32p, _i32p, _f64p,
                                              _f64p, _f64p, _D]
    lib.evolution_nulldim1_i32.argtypes = [_I, _i32p, _i32p, _f64p, _f64p,
                                           _D]
    lib.distance_filter_i32.argtypes = [_I, _i32p, _i32p, _f64p, _D]
    lib.classical_strength_i32.argtypes = [_I, _i32p, _i32p, _f64p, _D,
                                           _i32p, _i32p, _f64p]
    lib.classical_strength_i32.restype = _I
    lib.direct_interpolation_kernel_i32.argtypes = [_I, _i32p, _i32p,
                                                    _f64p, _i32p, _i32p,
                                                    _i32p, _i32p, _i32p,
                                                    _i32p, _f64p]
    lib.direct_interpolation_kernel_i32.restype = _I
    lib.standard_interpolation_i32.argtypes = [_I, _i32p, _i32p, _f64p,
                                               _i32p, _i32p, _f64p, _i32p,
                                               _i32p, _i32p, _i32p, _f64p]
    lib.standard_interpolation_i32.restype = _I
    lib.identity_minus_colscaled.argtypes = [_I, _i64p, _i64p, _f64p,
                                             _f64p, _D, _f64p]
    lib.identity_minus_colscaled.restype = _I
    lib.identity_minus_colscaled_i32.argtypes = [_I, _i32p, _i32p, _f64p,
                                                 _f64p, _D, _f64p]
    lib.identity_minus_colscaled_i32.restype = _I
    lib.weak_axis_filter.argtypes = [_I, _i64p, _i64p, _f64p, _I, _I,
                                     _i64p, _i64p, _i64p, _i64p, _f64p]
    lib.weak_axis_filter.restype = _I
    lib.weak_axis_filter_i32.argtypes = [_I, _i32p, _i32p, _f64p, _I, _I,
                                         _i64p, _i64p, _i32p, _i32p,
                                         _f64p]
    lib.weak_axis_filter_i32.restype = _I
    lib.identity_minus_rowscaled.argtypes = [_I, _i64p, _i64p, _f64p,
                                             _f64p, _D, _f64p]
    lib.identity_minus_rowscaled.restype = _I
    lib.identity_minus_rowscaled_i32.argtypes = [_I, _i32p, _i32p, _f64p,
                                                 _f64p, _D, _f64p]
    lib.identity_minus_rowscaled_i32.restype = _I
    lib.pattern_values.argtypes = [_I, _i64p, _i64p, _i64p, _i64p, _f64p,
                                   _f64p]
    lib.pattern_values.restype = _I
    lib.pattern_values_i32.argtypes = [_I, _i32p, _i32p, _i32p, _i32p,
                                       _f64p, _f64p]
    lib.pattern_values_i32.restype = _I
    lib.standard_aggregation.argtypes = [_I, _i64p, _i64p, _i64p, _i64p,
                                         ctypes.POINTER(_I)]
    lib.naive_aggregation.argtypes = [_I, _i64p, _i64p, _i64p, _i64p,
                                      ctypes.POINTER(_I)]
    lib.gauss_seidel_indexed.argtypes = [_I, _i64p, _i64p, _i64p, _f64p,
                                         _f64p, _f64p]
    lib.gauss_seidel_sweeps.argtypes = [_I, _i64p, _i64p, _f64p,
                                        _f64p, _f64p, _I, _I]
    lib.gauss_seidel_kaczmarz.argtypes = [_I, _i64p, _i64p, _f64p, _f64p,
                                          _f64p, _D]
    lib.bellman_ford.argtypes = [_I, _i64p, _i64p, _f64p, _I, _i64p, _f64p,
                                 _i64p]
    lib.bfs_levels.argtypes = [_I, _i64p, _i64p, _I, _i64p, _i64p,
                               ctypes.POINTER(_I)]
    lib.drake_matching_core.argtypes = [_I, _i64p, _i64p, _f64p, _i64p]
    lib.masked_spgemm.argtypes = [_I, _i64p, _i64p, _f64p, _i64p, _i64p,
                                  _f64p, _i64p, _i64p, _f64p]
    lib.masked_spgemm_i32.argtypes = [ctypes.c_int32, _i32p, _i32p, _f64p,
                                      _i32p, _i32p, _f64p, _i32p, _i32p,
                                      _f64p]
    lib.first_fit_coloring.argtypes = [_I, _i64p, _i64p, _i32p]
    lib.bsr_gauss_seidel.argtypes = [_I, _I, _i64p, _i64p, _f64p, _f64p,
                                     _f64p, _f64p, _I, _I, _I]
    lib.dia_offsets.argtypes = [_I, _I, _i64p, _i64p, _I, _i64p]
    lib.dia_offsets.restype = _I
    lib.dia_offsets_i32.argtypes = [_I, _I, _i32p, _i32p, _I, _i64p]
    lib.dia_offsets_i32.restype = _I
    lib.csr_to_dia_f64.argtypes = [_I, _I, _i64p, _i64p, _f64p, _I, _i64p,
                                   _f64p]
    lib.csr_to_dia_f32.argtypes = [_I, _I, _i64p, _i64p, _f64p, _I, _i64p,
                                   _f32p]
    lib.csr_to_dia_f64_i32.argtypes = [_I, _I, _i32p, _i32p, _f64p, _I,
                                       _i64p, _f64p]
    lib.csr_to_dia_f32_i32.argtypes = [_I, _I, _i32p, _i32p, _f64p, _I,
                                       _i64p, _f32p]
    lib.evolution_nulldim1.argtypes = [_I, _i64p, _i64p, _f64p, _f64p, _D]
    lib.distance_filter.argtypes = [_I, _i64p, _i64p, _f64p, _D]
    lib.standard_interpolation.argtypes = [_I, _i64p, _i64p, _f64p,
                                           _i64p, _i64p, _f64p,
                                           _i32p, _i64p, _i64p, _i64p,
                                           _f64p]
    lib.standard_interpolation.restype = _I
    lib.direct_interpolation_kernel.argtypes = [_I, _i64p, _i64p, _f64p,
                                                _i64p, _i64p,
                                                _i32p, _i64p, _i64p, _i64p,
                                                _f64p]
    lib.direct_interpolation_kernel.restype = _I
    lib.classical_strength.argtypes = [_I, _i64p, _i64p, _f64p, _D,
                                       _i64p, _i64p, _f64p]
    lib.classical_strength.restype = _I
    lib.identity_minus_scaled.argtypes = [_I, _i64p, _i64p, _f64p, _D,
                                          _f64p]
    lib.identity_minus_scaled.restype = _I
    lib.identity_minus_scaled_i32.argtypes = [_I, _i32p, _i32p, _f64p, _D,
                                              _f64p]
    lib.identity_minus_scaled_i32.restype = _I
    lib.masked_spgemm_rr.argtypes = [_I, _I, _i64p, _i64p, _f64p,
                                     _i64p, _i64p, _f64p,
                                     _i64p, _i64p, _f64p]
    lib.masked_spgemm_rr_i32.argtypes = [_I, _I, _i32p, _i32p, _f64p,
                                         _i32p, _i32p, _f64p,
                                         _i32p, _i32p, _f64p]
    lib.evolution_epilogue.argtypes = [_I, _i64p, _i64p, _f64p, _D, _I,
                                       _i64p, _i64p, _f64p]
    lib.evolution_epilogue.restype = _I
    lib.evolution_epilogue_i32.argtypes = [_I, _i32p, _i32p, _f64p, _D, _I,
                                           _i32p, _i32p, _f64p]
    lib.evolution_epilogue_i32.restype = _I
    lib.constraint_project.argtypes = [_I, _I, _i64p, _i64p, _f64p, _f64p,
                                       ctypes.c_void_p, _f64p]
    lib.constraint_project_i32.argtypes = [_I, _I, _i32p, _i32p, _f64p,
                                           _f64p, ctypes.c_void_p, _f64p]
    lib.pattern_gram.argtypes = [_I, _I, _i64p, _i64p, _f64p, _f64p]
    lib.pattern_gram_i32.argtypes = [_I, _I, _i32p, _i32p, _f64p, _f64p]
    lib.masked_spgemm_bsr.argtypes = [_I, _I, _I, _I, _i64p, _i64p, _f64p,
                                      _i64p, _i64p, _f64p,
                                      _i64p, _i64p, _f64p]
    lib.masked_spgemm_bsr_i32.argtypes = [_I, _I, _I, _I,
                                          _i32p, _i32p, _f64p,
                                          _i32p, _i32p, _f64p,
                                          _i32p, _i32p, _f64p]
    lib.constraint_project_bsr.argtypes = [_I, _I, _I, _I, _i64p, _i64p,
                                           _f64p, _f64p, ctypes.c_void_p,
                                           _f64p]
    lib.constraint_project_bsr_i32.argtypes = [_I, _I, _I, _I, _i32p,
                                               _i32p, _f64p, _f64p,
                                               ctypes.c_void_p, _f64p]
    lib.pattern_gram_bsr.argtypes = [_I, _I, _I, _i64p, _i64p, _f64p,
                                     _f64p]
    lib.pattern_gram_bsr_i32.argtypes = [_I, _I, _I, _i32p, _i32p, _f64p,
                                         _f64p]
    lib.thomas_lines.argtypes = [_I, _I, _f64p, _f64p, _f64p, _f64p, _f64p]


def _csr_arrays(A):
    return (np.ascontiguousarray(A.indptr, dtype=np.int64),
            np.ascontiguousarray(A.indices, dtype=np.int64))


def _csr_ix(A):
    """(indptr, indices, suffix): scipy's native int32 index arrays pass
    through copy-free to the ``*_i32`` kernel variants; anything else
    widens to int64 (the widening was measured at ~0.1-0.2 s per 9M-nnz
    matrix — a real fraction of the whole setup phase)."""
    p, j = A.indptr, A.indices
    if p.dtype == np.int32 and j.dtype == np.int32:
        return (np.ascontiguousarray(p), np.ascontiguousarray(j), "_i32")
    return (np.ascontiguousarray(p, dtype=np.int64),
            np.ascontiguousarray(j, dtype=np.int64), "")


def rs_cf_splitting(S, T):
    """Exact Ruge-Stuben splitting; S = strength CSR (zero diag), T = S^T."""
    lib = _load()
    n = S.shape[0]
    if not lib:
        return None
    Sp, Sj, sfx1 = _csr_ix(S)
    Tp, Tj, sfx2 = _csr_ix(T)
    out = np.zeros(n, dtype=np.int32)
    if sfx1 != sfx2:        # mixed index widths: widen both
        Sp, Sj = _csr_arrays(S)
        Tp, Tj = _csr_arrays(T)
        sfx1 = ""
    getattr(lib, "rs_cf_splitting" + sfx1)(n, Sp, Sj, Tp, Tj, out)
    return out


def standard_aggregation_native(C):
    lib = _load()
    if not lib:
        return None
    n = C.shape[0]
    Cp, Cj, sfx = _csr_ix(C)
    labels = np.zeros(n, dtype=np.int64)
    roots = np.zeros(n, dtype=np.int64)
    nr = _I(0)
    getattr(lib, "standard_aggregation" + sfx)(n, Cp, Cj, labels, roots,
                                               ctypes.byref(nr))
    return labels, roots[:nr.value].copy()


def naive_aggregation_native(C):
    lib = _load()
    if not lib:
        return None
    n = C.shape[0]
    Cp, Cj = _csr_arrays(C)
    labels = np.zeros(n, dtype=np.int64)
    roots = np.zeros(n, dtype=np.int64)
    nr = _I(0)
    lib.naive_aggregation(n, Cp, Cj, labels, roots, ctypes.byref(nr))
    return labels, roots[:nr.value].copy()


def gauss_seidel_indexed_native(A, x, b, order):
    lib = _load()
    if not lib or A.dtype != np.float64 or np.iscomplexobj(x):
        return False
    Ap, Aj = _csr_arrays(A)
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    order = np.ascontiguousarray(order, dtype=np.int64)
    lib.gauss_seidel_indexed(order.size, order, Ap, Aj, Ax, x,
                             np.ascontiguousarray(b, dtype=np.float64))
    return True


def gauss_seidel_sweeps_native(A, x, b, iterations, sweep):
    """All-iterations natural-order GS in one library call (mode:
    forward/backward/symmetric).  Returns False (caller falls back to
    the numpy path) for any unsupported input."""
    lib = _load()
    if (not lib or A.dtype != np.float64 or x.dtype != np.float64
            or not x.flags.c_contiguous or not x.flags.writeable):
        return False
    mode = {"forward": 0, "backward": 1, "symmetric": 2}.get(sweep)
    if mode is None:
        return False
    Ap, Aj, sfx = _csr_ix(A)
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    getattr(lib, "gauss_seidel_sweeps" + sfx)(
        A.shape[0], Ap, Aj, Ax, x,
        np.ascontiguousarray(b, dtype=np.float64), int(iterations), mode)
    return True


def gauss_seidel_kaczmarz_native(A, x, b, omega=1.0):
    lib = _load()
    if not lib or A.dtype != np.float64 or np.iscomplexobj(x):
        return False
    Ap, Aj, sfx = _csr_ix(A)
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    getattr(lib, "gauss_seidel_kaczmarz" + sfx)(
        A.shape[0], Ap, Aj, Ax, x,
        np.ascontiguousarray(b, dtype=np.float64), float(omega))
    return True


def bellman_ford_native(A, seeds):
    lib = _load()
    if not lib:
        return None
    n = A.shape[0]
    Ap, Aj = _csr_arrays(A)
    Ax = np.ascontiguousarray(np.abs(A.data), dtype=np.float64)
    seeds = np.ascontiguousarray(seeds, dtype=np.int64)
    dist = np.zeros(n, dtype=np.float64)
    nearest = np.zeros(n, dtype=np.int64)
    lib.bellman_ford(n, Ap, Aj, Ax, seeds.size, seeds, dist, nearest)
    return dist, nearest


def bfs_levels_native(A, seed):
    lib = _load()
    if not lib:
        return None
    n = A.shape[0]
    Ap, Aj = _csr_arrays(A)
    level = np.zeros(n, dtype=np.int64)
    order = np.zeros(n, dtype=np.int64)
    cnt = _I(0)
    lib.bfs_levels(n, Ap, Aj, int(seed), level, order, ctypes.byref(cnt))
    return order[:cnt.value].copy(), level


def masked_spgemm_native(A, B, pattern):
    """C = (A @ B) restricted to ``pattern``'s sparsity (CSR in/out);
    returns None without the native library or for non-float64 data.

    Row-scatter kernel: all three operands stay CSR — no CSC conversion
    of B (a full O(nnz) transpose pass the earlier merge-form kernel paid)."""
    lib = _load()
    if not lib:
        return None
    import scipy.sparse as sp

    # constructing csr_matrix FROM a csr_matrix copies all three arrays
    # (~0.3 s per 9M-nnz level); pass CSR operands through untouched.
    # Unsorted inputs are COPIED before sorting so the caller's (possibly
    # shared / fingerprinted) arrays are never mutated; already-sorted
    # inputs (every current caller) pass through untouched.
    def _csr(M, need_sorted=False):
        M = M if sp.issparse(M) and M.format == "csr" else sp.csr_matrix(M)
        if need_sorted and not M.has_sorted_indices:
            M = M.copy()
            M.sort_indices()
        return M

    A = _csr(A, need_sorted=True)
    if A.dtype != np.float64 or np.iscomplexobj(A.data):
        return None
    Br = _csr(B)
    if Br.dtype != np.float64:
        return None
    P = _csr(pattern, need_sorted=True)   # only the structure of P is read
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    Bx = np.ascontiguousarray(Br.data, dtype=np.float64)
    Cx = np.zeros(P.nnz, dtype=np.float64)
    idx = (A.indptr, A.indices, Br.indptr, Br.indices, P.indptr, P.indices)
    if all(a.dtype == np.int32 for a in idx):
        # scipy's native index width: no int64 widening copies
        a = [np.ascontiguousarray(x) for x in idx]
        lib.masked_spgemm_rr_i32(A.shape[0], Br.shape[1], a[0], a[1], Ax,
                                 a[2], a[3], Bx, a[4], a[5], Cx)
    else:
        a = [np.ascontiguousarray(x, dtype=np.int64) for x in idx]
        lib.masked_spgemm_rr(A.shape[0], Br.shape[1], a[0], a[1], Ax,
                             a[2], a[3], Bx, a[4], a[5], Cx)
    # fresh index arrays: callers mutate the result in place
    return sp.csr_matrix((Cx, P.indices.copy(), P.indptr.copy()),
                         shape=P.shape)


def constraint_project_native(vals, indptr, indices, B, BtBinv, fmask=None):
    """In-place constraint projection of pattern values ``vals`` so that
    (U @ B)[fmask] == 0 (role of satisfy_constraints_helper,
    smoothed_aggregation.h:556 fused with root-node I_F masking).
    Returns True on success, False when the native path doesn't apply."""
    lib = _load()
    if not lib:
        return False
    B = np.asarray(B)
    k = B.shape[1]
    if (k > 16 or vals.dtype != np.float64 or B.dtype != np.float64
            or np.asarray(BtBinv).dtype != np.float64):
        return False
    n = indptr.shape[0] - 1
    Bc = np.ascontiguousarray(B)
    Gc = np.ascontiguousarray(BtBinv)
    fptr = None
    if fmask is not None:
        fm = np.ascontiguousarray(fmask, dtype=np.uint8)
        fptr = fm.ctypes.data
    if indptr.dtype == np.int32 and indices.dtype == np.int32:
        lib.constraint_project_i32(n, k, np.ascontiguousarray(indptr),
                                   np.ascontiguousarray(indices), Bc, Gc,
                                   fptr, vals)
    else:
        lib.constraint_project(n, k,
                               np.ascontiguousarray(indptr, dtype=np.int64),
                               np.ascontiguousarray(indices, dtype=np.int64),
                               Bc, Gc, fptr, vals)
    return True


def pattern_gram_native(indptr, indices, B):
    """(n, k, k) per-row Gram matrices of B over a CSR pattern (role of
    calc_BtB, smoothed_aggregation.h:700), or None off the native path."""
    lib = _load()
    if not lib:
        return None
    B = np.asarray(B)
    k = B.shape[1]
    if k > 16 or B.dtype != np.float64:
        return None
    n = indptr.shape[0] - 1
    out = np.empty((n, k, k), dtype=np.float64)
    Bc = np.ascontiguousarray(B)
    if indptr.dtype == np.int32 and indices.dtype == np.int32:
        lib.pattern_gram_i32(n, k, np.ascontiguousarray(indptr),
                             np.ascontiguousarray(indices), Bc, out)
    else:
        lib.pattern_gram(n, k,
                         np.ascontiguousarray(indptr, dtype=np.int64),
                         np.ascontiguousarray(indices, dtype=np.int64),
                         Bc, out)
    return out


def masked_spgemm_bsr_native(nbc, R, Cb, Ap, Aj, Ax, Bp, Bj, Bx, Cp, Cj):
    """Blocked masked SpGEMM: (A @ B) restricted to the BLOCK pattern
    (Cp, Cj); A blocks (R, R), B/C blocks (R, Cb).  Returns the (nnzb, R,
    Cb) value array or None off the native path (role of
    incomplete_mat_mult_bsr, smoothed_aggregation.h:797)."""
    lib = _load()
    if not lib or Ax.dtype != np.float64 or Bx.dtype != np.float64:
        return None
    nbr = Ap.shape[0] - 1
    Cx = np.zeros((Cp[-1], R, Cb), dtype=np.float64)
    Axc = np.ascontiguousarray(Ax)
    Bxc = np.ascontiguousarray(Bx)
    idx = (Ap, Aj, Bp, Bj, Cp, Cj)
    if all(a.dtype == np.int32 for a in idx):
        a = [np.ascontiguousarray(x) for x in idx]
        lib.masked_spgemm_bsr_i32(nbr, int(nbc), int(R), int(Cb),
                                  a[0], a[1], Axc, a[2], a[3], Bxc,
                                  a[4], a[5], Cx)
    else:
        a = [np.ascontiguousarray(x, dtype=np.int64) for x in idx]
        lib.masked_spgemm_bsr(nbr, int(nbc), int(R), int(Cb),
                              a[0], a[1], Axc, a[2], a[3], Bxc,
                              a[4], a[5], Cx)
    return Cx


def constraint_project_bsr_native(vals, indptr, indices, R, Cb, B, Gblock,
                                  fmask=None):
    """In-place blocked constraint projection: vals (nnzb, R, Cb) on the
    block pattern, B (ncols_scalar, k), Gblock (nbr, k, k) per-BLOCK-row
    Gram pinv, fmask nullable per-scalar-row keep mask.  Returns True on
    success (role of satisfy_constraints_helper on BSR iterates)."""
    lib = _load()
    if not lib:
        return False
    B = np.asarray(B)
    k = B.shape[1]
    if (k > 16 or vals.dtype != np.float64 or B.dtype != np.float64
            or np.asarray(Gblock).dtype != np.float64):
        return False
    nbr = indptr.shape[0] - 1
    Bc = np.ascontiguousarray(B)
    Gc = np.ascontiguousarray(Gblock)
    fptr = None
    if fmask is not None:
        fm = np.ascontiguousarray(fmask, dtype=np.uint8)
        fptr = fm.ctypes.data
    if indptr.dtype == np.int32 and indices.dtype == np.int32:
        lib.constraint_project_bsr_i32(nbr, int(R), int(Cb), k,
                                       np.ascontiguousarray(indptr),
                                       np.ascontiguousarray(indices),
                                       Bc, Gc, fptr, vals)
    else:
        lib.constraint_project_bsr(nbr, int(R), int(Cb), k,
                                   np.ascontiguousarray(indptr,
                                                        dtype=np.int64),
                                   np.ascontiguousarray(indices,
                                                        dtype=np.int64),
                                   Bc, Gc, fptr, vals)
    return True


def pattern_gram_bsr_native(indptr, indices, Cb, B):
    """(nbr, k, k) per-BLOCK-row Grams of B over a block pattern whose
    blocks span Cb scalar columns each, or None off the native path."""
    lib = _load()
    if not lib:
        return None
    B = np.asarray(B)
    k = B.shape[1]
    if k > 16 or B.dtype != np.float64:
        return None
    nbr = indptr.shape[0] - 1
    out = np.empty((nbr, k, k), dtype=np.float64)
    Bc = np.ascontiguousarray(B)
    if indptr.dtype == np.int32 and indices.dtype == np.int32:
        lib.pattern_gram_bsr_i32(nbr, int(Cb), k,
                                 np.ascontiguousarray(indptr),
                                 np.ascontiguousarray(indices), Bc, out)
    else:
        lib.pattern_gram_bsr(nbr, int(Cb), k,
                             np.ascontiguousarray(indptr, dtype=np.int64),
                             np.ascontiguousarray(indices, dtype=np.int64),
                             Bc, out)
    return out


def thomas_lines_native(dl, dm, du, R):
    """In-place batched Thomas solve of independent tridiagonal lines:
    all arrays (nlines, L) row-major f64, R overwritten with the solution.
    Returns True on success (role of the host zebra inner solve,
    relaxation.py:196)."""
    lib = _load()
    if (not lib or R.dtype != np.float64 or dm.dtype != np.float64
            or dl.dtype != np.float64 or du.dtype != np.float64
            or not R.flags["C_CONTIGUOUS"]):
        return False
    nlines, L = R.shape
    cp = np.empty_like(R)
    lib.thomas_lines(nlines, L, np.ascontiguousarray(dl),
                     np.ascontiguousarray(dm), np.ascontiguousarray(du),
                     R, cp)
    return True


def identity_minus_scaled_native(M, c):
    """Data array of S = I - c*M over M's own CSR pattern, or None when the
    native library is missing, dtypes don't fit, or a row lacks a stored
    diagonal (the caller then falls back to a sparse add)."""
    lib = _load()
    if not lib:
        return None
    if M.dtype != np.float64 or np.iscomplexobj(M.data):
        return None
    n = M.shape[0]
    Sx = np.empty(M.nnz, dtype=np.float64)
    Ax = np.ascontiguousarray(M.data, dtype=np.float64)
    if M.indptr.dtype == np.int32 and M.indices.dtype == np.int32:
        got = lib.identity_minus_scaled_i32(
            n, np.ascontiguousarray(M.indptr),
            np.ascontiguousarray(M.indices), Ax, float(c), Sx)
    else:
        got = lib.identity_minus_scaled(
            n, np.ascontiguousarray(M.indptr, dtype=np.int64),
            np.ascontiguousarray(M.indices, dtype=np.int64), Ax, float(c),
            Sx)
    return Sx if got == n else None


def identity_minus_colscaled_native(A, Dinv, c):
    """Data array of S = I - c*A*diag(Dinv) over A's own CSR pattern —
    for probe-verified symmetric A this is (I - c*D^{-1}A)^T without any
    CSC conversion or scaled copy.  None when unavailable or a row lacks
    a stored diagonal."""
    lib = _load()
    if not lib:
        return None
    if A.dtype != np.float64 or np.iscomplexobj(A.data):
        return None
    n = A.shape[0]
    Sx = np.empty(A.nnz, dtype=np.float64)
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    Dc = np.ascontiguousarray(Dinv, dtype=np.float64)
    Ap, Aj, sfx = _csr_ix(A)
    got = getattr(lib, "identity_minus_colscaled" + sfx)(
        n, Ap, Aj, Ax, Dc, float(c), Sx)
    return Sx if got == n else None


def weak_axis_filter_native(A, q, strides, block):
    """Compacted CSR of A restricted to weak-axis (uncoarsened-delta-zero)
    stencil couplings, or None when unavailable.  ``strides``/``block``
    in natural axis order; the kernel visits axes by descending stride
    with np.rint (half-even) delta rounding — matching the numpy
    reference bit-for-bit."""
    lib = _load()
    if not lib:
        return None
    if A.dtype != np.float64 or np.iscomplexobj(A.data):
        return None
    import scipy.sparse as sp

    n = A.shape[0]
    order = np.argsort(strides)[::-1]
    strides_desc = np.ascontiguousarray(
        np.asarray(strides, dtype=np.int64)[order])
    coarsened_desc = np.ascontiguousarray(
        (np.asarray(block, dtype=np.int64)[order] != 1).astype(np.int64))
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    Ap, Aj, sfx = _csr_ix(A)
    Bp = np.empty(n + 1, dtype=Ap.dtype)
    Bj = np.empty(A.nnz, dtype=Aj.dtype)
    Bx = np.empty(A.nnz, dtype=np.float64)
    out = getattr(lib, "weak_axis_filter" + sfx)(
        n, Ap, Aj, Ax, int(q), len(strides_desc), strides_desc,
        coarsened_desc, Bp, Bj, Bx)
    Aw = sp.csr_matrix((Bx[:out], Bj[:out], Bp), shape=A.shape)
    Aw.has_sorted_indices = A.has_sorted_indices
    return Aw


def identity_minus_rowscaled_native(A, Dinv, c):
    """Data array of S = I - c*diag(Dinv)*A over A's own CSR pattern, or
    None when unavailable / a row lacks a stored diagonal."""
    lib = _load()
    if not lib:
        return None
    if A.dtype != np.float64 or np.iscomplexobj(A.data):
        return None
    n = A.shape[0]
    Sx = np.empty(A.nnz, dtype=np.float64)
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    Dc = np.ascontiguousarray(Dinv, dtype=np.float64)
    Ap, Aj, sfx = _csr_ix(A)
    got = getattr(lib, "identity_minus_rowscaled" + sfx)(
        n, Ap, Aj, Ax, Dc, float(c), Sx)
    return Sx if got == n else None


def pattern_values_native(C, A):
    """Data array holding A's values on C's (sorted) pattern, or None.

    Exact-intersection semantics: returns None (fall back to scipy
    ``multiply``) when any C entry is absent from A's pattern, so callers
    replacing ``ones_like(C).multiply(A)`` get bit-identical results.
    Both matrices must have sorted indices."""
    lib = _load()
    if not lib:
        return None
    if A.dtype != np.float64 or np.iscomplexobj(A.data) \
            or C.shape != A.shape:
        return None
    n = A.shape[0]
    Cp, Cj, sfx_c = _csr_ix(C)
    Ap, Aj, sfx_a = _csr_ix(A)
    if sfx_c != sfx_a:
        Cp = np.ascontiguousarray(Cp, dtype=np.int64)
        Cj = np.ascontiguousarray(Cj, dtype=np.int64)
        Ap = np.ascontiguousarray(Ap, dtype=np.int64)
        Aj = np.ascontiguousarray(Aj, dtype=np.int64)
        sfx_a = ""
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    out = np.empty(C.nnz, dtype=np.float64)
    missing = getattr(lib, "pattern_values" + sfx_a)(
        n, Cp, Cj, Ap, Aj, Ax, out)
    return out if missing == 0 else None


def evolution_epilogue_native(Atilde, epsilon, symmetrize):
    """Fused evolution-SOC tail: distance filter + 0.5(A+A^T) symmetrize +
    unit diagonal + inversion + row scaling in one native call.  Returns the
    finished CSR strength matrix, or None when unavailable.  Consumes
    ``Atilde.data`` (modified in place)."""
    lib = _load()
    if not lib:
        return None
    import scipy.sparse as sp

    if Atilde.dtype != np.float64 or np.iscomplexobj(Atilde.data):
        return None
    n = Atilde.shape[0]
    cap = 2 * Atilde.nnz + n
    Ax = np.ascontiguousarray(Atilde.data, dtype=np.float64)
    eps = np.inf if epsilon is None else float(epsilon)
    sym = int(bool(symmetrize))
    if Atilde.indptr.dtype == np.int32 and Atilde.indices.dtype == np.int32:
        Op = np.empty(n + 1, dtype=np.int32)
        Oj = np.empty(cap, dtype=np.int32)
        Ox = np.empty(cap, dtype=np.float64)
        nnz = lib.evolution_epilogue_i32(
            n, np.ascontiguousarray(Atilde.indptr),
            np.ascontiguousarray(Atilde.indices), Ax, eps, sym, Op, Oj, Ox)
    else:
        Op = np.empty(n + 1, dtype=np.int64)
        Oj = np.empty(cap, dtype=np.int64)
        Ox = np.empty(cap, dtype=np.float64)
        nnz = lib.evolution_epilogue(
            n, np.ascontiguousarray(Atilde.indptr, dtype=np.int64),
            np.ascontiguousarray(Atilde.indices, dtype=np.int64), Ax, eps,
            sym, Op, Oj, Ox)
    return sp.csr_matrix((Ox[:nnz], Oj[:nnz], Op),
                         shape=Atilde.shape)


def first_fit_coloring_native(G):
    """Greedy first-fit vertex coloring of CSR graph G (diagonal ignored by
    the caller); returns int32 colors or None without the native library."""
    lib = _load()
    if not lib:
        return None
    Gp, Gj = _csr_arrays(G)
    colors = np.full(G.shape[0], -1, dtype=np.int32)
    lib.first_fit_coloring(G.shape[0], Gp, Gj, colors)
    return colors


def bsr_gauss_seidel_native(indptr, indices, data, Dinv, x, b, bs,
                            start, stop, step):
    """In-place block Gauss-Seidel sweep over BSR arrays (f64 real only);
    returns False without the native library or for other dtypes
    (role of bsr_gauss_seidel, relaxation.h:90)."""
    lib = _load()
    if not lib or data.dtype != np.float64 or np.iscomplexobj(data):
        return False
    nb = indptr.shape[0] - 1
    ip = np.ascontiguousarray(indptr, dtype=np.int64)
    ix = np.ascontiguousarray(indices, dtype=np.int64)
    dv = np.ascontiguousarray(data, dtype=np.float64)
    di = np.ascontiguousarray(Dinv, dtype=np.float64)
    bv = np.ascontiguousarray(b, dtype=np.float64)
    assert x.flags["C_CONTIGUOUS"] and x.dtype == np.float64
    lib.bsr_gauss_seidel(nb, int(bs), ip, ix, dv, di, x, bv,
                         int(start), int(stop), int(step))
    return True


def drake_matching_native(A, weights=None):
    lib = _load()
    if not lib:
        return None
    n = A.shape[0]
    Ap, Aj = _csr_arrays(A)
    w = np.ascontiguousarray(
        np.abs(A.data) if weights is None else weights, dtype=np.float64)
    match = np.zeros(n, dtype=np.int64)
    lib.drake_matching_core(n, Ap, Aj, w, match)
    return match


def evolution_nulldim1_native(Atilde, b1, tiny):
    """In-place single-candidate evolution misfit on a CSR matrix's data
    (f64 real only); returns False otherwise (role of the NullDim==1 case
    of evolution_strength_helper, evolution_strength.h:316)."""
    lib = _load()
    if not lib or Atilde.dtype != np.float64 \
            or np.iscomplexobj(Atilde.data):
        return False
    Ap, Aj, sfx = _csr_ix(Atilde)
    assert Atilde.data.flags["C_CONTIGUOUS"]
    getattr(lib, "evolution_nulldim1" + sfx)(
        Atilde.shape[0], Ap, Aj, Atilde.data,
        np.ascontiguousarray(b1, dtype=np.float64), float(tiny))
    return True


def distance_filter_native(C, epsilon):
    """In-place relative distance filter on CSR data (f64 real only);
    dropped entries are zeroed (caller compacts).  Returns False otherwise
    (role of apply_distance_filter, evolution_strength.h:136)."""
    lib = _load()
    if not lib or C.dtype != np.float64 or np.iscomplexobj(C.data):
        return False
    Cp, Cj, sfx = _csr_ix(C)
    assert C.data.flags["C_CONTIGUOUS"]
    getattr(lib, "distance_filter" + sfx)(C.shape[0], Cp, Cj, C.data,
                                          float(epsilon))
    return True


def classical_strength_native(A, theta):
    """One-pass classical SOC with filter/abs/row-scale fused (roles of
    ruge_stuben.h:46 + scale_rows_by_largest_entry); returns CSR S or None
    without the native library / for non-f64 data."""
    lib = _load()
    if not lib or A.dtype != np.float64 or np.iscomplexobj(A.data):
        return None
    import scipy.sparse as sp

    n = A.shape[0]
    Ap, Aj, sfx = _csr_ix(A)
    idt = np.int32 if sfx else np.int64
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    Sp = np.zeros(n + 1, dtype=idt)
    Sj = np.zeros(A.nnz, dtype=idt)
    Sx = np.zeros(A.nnz, dtype=np.float64)
    nnz = getattr(lib, "classical_strength" + sfx)(n, Ap, Aj, Ax,
                                                   float(theta), Sp, Sj, Sx)
    return sp.csr_matrix((Sx[:nnz].copy(), Sj[:nnz].copy(), Sp),
                         shape=A.shape)


def direct_interpolation_native(A, C, splitting, cmap, nc):
    """One-pass direct interpolation with the A-on-C-pattern projection
    fused in (roles of rs_direct_interpolation_pass1/2, ruge_stuben.h:497);
    returns CSR P or None without the native library / for non-f64 data."""
    lib = _load()
    if not lib or A.dtype != np.float64 or np.iscomplexobj(A.data):
        return None
    import scipy.sparse as sp

    n = A.shape[0]
    Ap, Aj, sfx1 = _csr_ix(A)
    Cp, Cj, sfx2 = _csr_ix(C)
    if sfx1 != sfx2:        # mixed index widths: widen both
        Ap, Aj = _csr_arrays(A)
        Cp, Cj = _csr_arrays(C)
        sfx1 = ""
    idt = np.int32 if sfx1 else np.int64
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    split32 = np.ascontiguousarray(splitting, dtype=np.int32)
    cmap_n = np.ascontiguousarray(cmap, dtype=idt)
    cap = C.nnz + n
    Pp = np.zeros(n + 1, dtype=idt)
    Pj = np.zeros(cap, dtype=idt)
    Px = np.zeros(cap, dtype=np.float64)
    nnz = getattr(lib, "direct_interpolation_kernel" + sfx1)(
        n, Ap, Aj, Ax, Cp, Cj, split32, cmap_n, Pp, Pj, Px)
    return sp.csr_matrix((Px[:nnz].copy(), Pj[:nnz].copy(), Pp),
                         shape=(n, int(nc)))


def standard_interpolation_native(A, S, splitting, cmap, nc):
    """One-pass standard (distance-2) interpolation; returns CSR P or None
    without the native library / for non-f64 data (role of the unexported
    rs_standard_interpolation, ruge_stuben.h:601)."""
    lib = _load()
    if not lib or A.dtype != np.float64 or S.dtype != np.float64 \
            or np.iscomplexobj(A.data) or np.iscomplexobj(S.data):
        return None
    import scipy.sparse as sp

    n = A.shape[0]
    Ap, Aj, sfx1 = _csr_ix(A)
    Sp, Sj, sfx2 = _csr_ix(S)
    if sfx1 != sfx2:        # mixed index widths: widen both
        Ap, Aj = _csr_arrays(A)
        Sp, Sj = _csr_arrays(S)
        sfx1 = ""
    idt = np.int32 if sfx1 else np.int64
    Ax = np.ascontiguousarray(A.data, dtype=np.float64)
    Sx = np.ascontiguousarray(S.data, dtype=np.float64)
    split32 = np.ascontiguousarray(splitting, dtype=np.int32)
    cmap_n = np.ascontiguousarray(cmap, dtype=idt)
    # capacity: every stored S entry could be a strong-C emit, plus C rows
    cap = S.nnz + n
    Pp = np.zeros(n + 1, dtype=idt)
    Pj = np.zeros(cap, dtype=idt)
    Px = np.zeros(cap, dtype=np.float64)
    nnz = getattr(lib, "standard_interpolation" + sfx1)(
        n, Ap, Aj, Ax, Sp, Sj, Sx, split32, cmap_n, Pp, Pj, Px)
    return sp.csr_matrix((Px[:nnz].copy(), Pj[:nnz].copy(), Pp),
                         shape=(n, int(nc)))


def dia_offsets_native(A_csr, max_offsets=128):
    """Distinct diagonal offsets of a CSR matrix (sorted int64 array) in
    one native pass; None without the library or if more than
    ``max_offsets`` diagonals."""
    lib = _load()
    if not lib:
        return None
    n, m = A_csr.shape
    offsets = np.zeros(max_offsets, dtype=np.int64)
    idx = (A_csr.indptr, A_csr.indices)
    if all(a.dtype == np.int32 for a in idx):
        k = lib.dia_offsets_i32(n, m, np.ascontiguousarray(A_csr.indptr),
                                np.ascontiguousarray(A_csr.indices),
                                max_offsets, offsets)
    else:
        Ap, Aj = _csr_arrays(A_csr)
        k = lib.dia_offsets(n, m, Ap, Aj, max_offsets, offsets)
    if k < 0:
        return None
    return offsets[:k].copy()


def csr_to_dia_fill_native(A_csr, offsets, dtype=None):
    """Scatter a real-f64 CSR matrix into zeroed (k, n) diagonal arrays in
    one native pass (casting on the fly); None for unsupported dtypes."""
    lib = _load()
    if not lib or A_csr.dtype != np.float64 \
            or np.iscomplexobj(A_csr.data):
        return None
    dt = np.dtype(dtype) if dtype is not None else A_csr.dtype
    if dt not in (np.dtype(np.float64), np.dtype(np.float32)):
        return None
    n, m = A_csr.shape
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    k = offsets.size
    Ax = np.ascontiguousarray(A_csr.data, dtype=np.float64)
    diags = np.zeros((k, n), dtype=dt)
    idx = (A_csr.indptr, A_csr.indices)
    if all(a.dtype == np.int32 for a in idx):
        Ap = np.ascontiguousarray(A_csr.indptr)
        Aj = np.ascontiguousarray(A_csr.indices)
        fill = lib.csr_to_dia_f32_i32 if dt == np.float32 \
            else lib.csr_to_dia_f64_i32
    else:
        Ap, Aj = _csr_arrays(A_csr)
        fill = lib.csr_to_dia_f32 if dt == np.float32 \
            else lib.csr_to_dia_f64
    fill(n, m, Ap, Aj, Ax, k, offsets, diags)
    return diags


def csr_to_dia_native(A_csr, dtype=None, max_offsets=128):
    """(diags, offsets) DIA host arrays for a real-f64 CSR matrix in two
    single-stream native passes; None without the native library / for
    unsupported dtypes / too many diagonals (role of the numpy
    gather-scatter staging in SparseDIA.host_diags)."""
    offs = dia_offsets_native(A_csr, max_offsets=max_offsets)
    if offs is None:
        return None
    diags = csr_to_dia_fill_native(A_csr, offs, dtype=dtype)
    if diags is None:
        return None
    return diags, tuple(int(o) for o in offs)
