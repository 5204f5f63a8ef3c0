"""Reference-style robustness sweeps (SURVEY.md §4.3): input formats,
dtypes, complex-valued duplicates of the main solver paths."""

import numpy as np
import pytest
import scipy.sparse as sp

import pyamg_tpu
from pyamg_tpu.gallery import poisson, gauge_laplacian


def rng():
    return np.random.default_rng(0)


def conv_factor(res):
    res = np.asarray(res)
    return (res[-1] / res[0]) ** (1.0 / max(len(res) - 1, 1))


class TestInputFormats:
    @pytest.mark.parametrize("fmt", ["csr", "csc", "coo", "bsr", "dense"])
    def test_sa_accepts_format(self, fmt):
        A = poisson((16, 16), format="csr")
        Af = A.toarray() if fmt == "dense" else A.asformat(fmt)
        ml = pyamg_tpu.smoothed_aggregation_solver(Af, max_coarse=20)
        b = rng().standard_normal(A.shape[0])
        res = []
        ml.solve(b, tol=1e-8, maxiter=60, residuals=res)
        assert conv_factor(res) < 0.9, fmt

    @pytest.mark.parametrize("fmt", ["csr", "csc", "coo"])
    def test_classical_accepts_format(self, fmt):
        A = poisson((16, 16), format="csr").asformat(fmt)
        ml = pyamg_tpu.ruge_stuben_solver(A, max_coarse=20)
        b = rng().standard_normal(A.shape[0])
        res = []
        ml.solve(b, tol=1e-8, maxiter=60, residuals=res)
        assert conv_factor(res) < 0.3, fmt


class TestDtypes:
    @pytest.mark.parametrize("dt", [np.float32, np.float64])
    def test_sa_dtypes(self, dt):
        A = poisson((16, 16), format="csr").astype(dt)
        ml = pyamg_tpu.smoothed_aggregation_solver(A, max_coarse=20)
        b = rng().standard_normal(A.shape[0]).astype(dt)
        tol = 1e-4 if dt == np.float32 else 1e-8
        res = []
        x = ml.solve(b, tol=tol, maxiter=60, residuals=res)
        assert np.linalg.norm(b - A @ np.asarray(x)) < \
            10 * tol * np.linalg.norm(b)


class TestComplexSolvers:
    def test_complex_sa(self):
        A = gauge_laplacian(12, beta=0.05, seed=0)
        ml = pyamg_tpu.smoothed_aggregation_solver(A, max_coarse=20)
        b = (rng().standard_normal(A.shape[0])
             + 1j * rng().standard_normal(A.shape[0]))
        res = []
        x = ml.solve(b, tol=1e-8, maxiter=80, accel="cg", residuals=res)
        assert res[-1] / res[0] < 1e-6

    def test_complex_classical(self):
        A = gauge_laplacian(12, beta=0.05, seed=1)
        ml = pyamg_tpu.ruge_stuben_solver(A, max_coarse=20)
        b = (rng().standard_normal(A.shape[0])
             + 1j * rng().standard_normal(A.shape[0]))
        res = []
        ml.solve(b, tol=1e-8, maxiter=80, residuals=res)
        assert res[-1] / res[0] < 1e-4

    def test_complex_relaxation_consistency(self):
        from pyamg_tpu.relaxation import relaxation as rel

        A = gauge_laplacian(8, beta=0.1, seed=2)
        b = (rng().standard_normal(A.shape[0])
             + 1j * rng().standard_normal(A.shape[0]))
        x = np.zeros(A.shape[0], dtype=complex)
        r0 = np.linalg.norm(b - A @ x)
        rel.gauss_seidel(A, x, b, iterations=5)
        assert np.linalg.norm(b - A @ x) < 0.8 * r0


class TestDocstringExamples:
    """Run the runnable docstring examples (the reference's doctest layer)."""

    def test_doctests(self):
        import doctest

        import pyamg_tpu.gallery.stencil as m1
        import pyamg_tpu.gallery.laplacian as m2
        import pyamg_tpu.gallery.diffusion as m3
        import pyamg_tpu.classical.interpolate as m4
        import pyamg_tpu.relaxation.chebyshev as m5
        import pyamg_tpu.aggregation.tentative as m6

        failures = 0
        for mod in (m1, m2, m3, m4, m5, m6):
            res = doctest.testmod(mod, verbose=False)
            failures += res.failed
        assert failures == 0


class TestReferenceNumbers:
    """Published quantitative behavior from the reference (BASELINE.md)."""

    def test_poisson_hierarchy_stats(self):
        # README example: 500x500 Poisson classical AMG -> ~6 levels,
        # OC ~2.2, GC ~1.67.  Use 100x100 (same asymptotics, CI-speed) and
        # check the complexity band.
        A = poisson((100, 100), format="csr")
        ml = pyamg_tpu.ruge_stuben_solver(A)
        assert 1.8 < ml.operator_complexity() < 2.6
        assert 1.4 < ml.grid_complexity() < 2.0

    def test_blackbox_poisson_40(self):
        # blackbox.py doctest: solve() on 40x40 Poisson reaches ~6e-6
        A = poisson((40, 40), format="csr")
        b = np.arange(A.shape[0], dtype=float)
        x = pyamg_tpu.solve(A, b, verb=False)
        rel = np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b)
        assert rel < 1e-4
