"""Pallas DIA-SpMV kernel tests.

Interpreter-mode tests run on any backend (CPU CI); compiled tests run on
TPU only.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import scipy.sparse as sp

from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse import SparseDIA
from pyamg_tpu.sparse.pallas_kernels import (
    dia_matvec_pallas, dia_matvec_pallas_v2, pallas_available,
    pallas_dia_supported)


def _cases():
    rng = np.random.default_rng(0)
    A1 = poisson((512, 512), format="csr")
    A2 = poisson((300, 257), format="csr")
    n2 = A2.shape[0]
    A2 = sp.csr_matrix(A2
                       + 0.3 * sp.diags(rng.random(n2 - 258), 258)
                       + 0.2 * sp.diags(rng.random(n2 - 127), -127)
                       + 0.1 * sp.diags(rng.random(n2 - 5), 5))
    A3 = poisson((70001,), format="csr")
    return [A1, A2, A3]


class TestPallasInterpret:
    """Correctness in the Pallas interpreter (runs everywhere)."""

    @pytest.mark.parametrize("idx", [0, 1, 2])
    def test_halo_kernel_matches_xla(self, idx):
        A = _cases()[idx]
        D = SparseDIA.from_scipy(A).astype(jnp.float32)
        x = jnp.asarray(np.random.default_rng(1)
                        .random(A.shape[0]).astype(np.float32))
        y_ref = D.matvec_xla(x)
        y = dia_matvec_pallas(D.diags, D.offsets, x, interpret=True)
        assert float(jnp.abs(y_ref - y).max()) < 1e-5

    def test_2d_roll_kernel_matches_xla(self):
        A = _cases()[1]
        D = SparseDIA.from_scipy(A).astype(jnp.float32)
        x = jnp.asarray(np.random.default_rng(2)
                        .random(A.shape[0]).astype(np.float32))
        y_ref = D.matvec_xla(x)
        y = dia_matvec_pallas_v2(D.diags, D.offsets, x, interpret=True)
        assert float(jnp.abs(y_ref - y).max()) < 1e-5

    def test_support_gate(self):
        # CPU backend: never claims support; constraints checked structurally
        ok = pallas_dia_supported((-2048, -1, 0, 1, 2048),
                                  (4 << 20, 4 << 20), jnp.float32)
        assert ok == pallas_available()
        assert not pallas_dia_supported((0,), (100, 100), jnp.float32)
        assert not pallas_dia_supported((0, 100000), (1 << 20, 1 << 20),
                                        jnp.float32)


@pytest.mark.skipif(not pallas_available(),
                    reason="Pallas TPU backend not available")
class TestPallasCompiled:
    def test_matvec_dispatch_matches_xla(self):
        A = poisson((512, 512), format="csr")
        D = SparseDIA.from_scipy(A).astype(jnp.float32)
        x = jnp.asarray(np.random.default_rng(0)
                        .random(A.shape[0]).astype(np.float32))
        y_ref = D.matvec_xla(x)
        y_pal = D.matvec(x)     # dispatches to the Pallas kernel on TPU
        assert float(jnp.abs(y_ref - y_pal).max()) < 1e-5


# ---------------------------------------------------------------------------
# Masked-SpGEMM kernel (spgemm_pallas)
# ---------------------------------------------------------------------------

from pyamg_tpu.sparse import spgemm_pallas as _spp
from pyamg_tpu.sparse.spgemm_device import (masked_spgemm_ell,
                                            pattern_spgemm, rap_pattern)
from pyamg_tpu.sparse.ell import SparseELL


def _banded_random(n, m, bw, nnz_per_row=5, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), nnz_per_row)
    cols = np.clip((rows * m) // n
                   + rng.integers(-bw, bw + 1, size=rows.size), 0, m - 1)
    A = sp.coo_matrix((rng.standard_normal(rows.size), (rows, cols)),
                      shape=(n, m)).tocsr()
    A.sum_duplicates()
    A.sort_indices()
    return A


class TestSpgemmPallasInterpret:
    """Kernel correctness in the Pallas interpreter (runs everywhere)."""

    def setup_method(self):
        _spp._INTERPRET[0] = True

    def teardown_method(self):
        _spp._INTERPRET[0] = False

    @pytest.mark.parametrize("dims", [
        (300, 200, 150, 8, 5),      # rectangular chain
        (700, 700, 300, 40, 20),    # wider bands, multiple chunks
    ])
    def test_matches_xla_masked_product(self, dims):
        n, m, k, bw1, bw2 = dims
        A_csr = _banded_random(n, m, bw1, seed=1)
        B_csr = _banded_random(m, k, bw2, seed=2)
        A = SparseELL.from_scipy(A_csr, dtype=np.float32)
        B = SparseELL.from_scipy(B_csr, dtype=np.float32)
        pat = pattern_spgemm(A_csr, B_csr, dtype=np.float32)
        ref = masked_spgemm_ell(A, B, pat)
        plan = _spp.MaskedSpgemmPlan(A, B, pat, T=64, Wc=64)
        assert plan.feasible
        out = plan(A, B)
        r = np.asarray(ref.data, dtype=np.float64)
        o = np.asarray(out.data, dtype=np.float64)
        scale = np.abs(r).max() or 1.0
        # bf16x3 contraction: ~1e-5 relative (3-pass hi/lo split)
        assert np.abs(r - o).max() / scale < 5e-5

    def test_plan_reuse_fresh_data(self):
        # same structure, new values: the symbolic plan must be reusable
        A_csr = _banded_random(257, 257, 6, seed=3)
        B_csr = _banded_random(257, 130, 4, seed=4)
        pat = pattern_spgemm(A_csr, B_csr, dtype=np.float32)
        A1 = SparseELL.from_scipy(A_csr, dtype=np.float32)
        B1 = SparseELL.from_scipy(B_csr, dtype=np.float32)
        plan = _spp.MaskedSpgemmPlan(A1, B1, pat, T=64, Wc=64)
        A2_csr = A_csr.copy()
        A2_csr.data = np.random.default_rng(9).standard_normal(A_csr.nnz)
        A2 = SparseELL.from_scipy(A2_csr, dtype=np.float32)
        out = plan(A2, B1)
        ref = masked_spgemm_ell(A2, B1, pat)
        r = np.asarray(ref.data, dtype=np.float64)
        o = np.asarray(out.data, dtype=np.float64)
        assert np.abs(r - o).max() / (np.abs(r).max() or 1.0) < 5e-5

    def test_rap_chain_on_poisson(self):
        # the Galerkin use case: P^T A P on a real hierarchy slab
        from pyamg_tpu.classical.classical import ruge_stuben_solver
        A_csr = sp.csr_matrix(poisson((24, 24), format="csr"))
        ml = ruge_stuben_solver(A_csr, max_levels=2, max_coarse=10)
        P_csr = sp.csr_matrix(ml.levels[0].P_csr
                              if hasattr(ml.levels[0], "P_csr")
                              else ml.levels[0].P)
        R_csr = sp.csr_matrix(P_csr.T)
        R_csr.sort_indices()
        A = SparseELL.from_scipy(A_csr, dtype=np.float32)
        P = SparseELL.from_scipy(P_csr, dtype=np.float32)
        R = SparseELL.from_scipy(R_csr, dtype=np.float32)
        pat_AP, pat_RAP = rap_pattern(R_csr, A_csr, P_csr, dtype=np.float32)
        plan_AP = _spp.MaskedSpgemmPlan(A, P, pat_AP, T=64, Wc=64)
        plan_RAP = _spp.MaskedSpgemmPlan(R, pat_AP, pat_RAP, T=64, Wc=64)
        AP = plan_AP(A, P)
        RAP = plan_RAP(R, AP)
        RAP_true = (R_csr.astype(np.float64) @ A_csr.astype(np.float64)
                    @ P_csr.astype(np.float64))
        got = RAP.to_scipy().astype(np.float64)
        scale = abs(RAP_true).max()
        assert abs(got - RAP_true).max() / scale < 5e-5


class TestSpgemmPlanGates:
    def test_infeasible_wide_unique(self):
        # a dense-ish random matrix blows the per-chunk unique-column cap
        rng = np.random.default_rng(0)
        A_csr = sp.csr_matrix(rng.random((600, 600)) < 0.05, dtype=np.float32)
        A_csr.data = rng.standard_normal(A_csr.nnz).astype(np.float32)
        A = SparseELL.from_scipy(A_csr, dtype=np.float32)
        pat = pattern_spgemm(A_csr, A_csr, dtype=np.float32)
        plan = _spp.MaskedSpgemmPlan(A, A, pat, T=64, Wc=64, max_Uc=128)
        assert not plan.feasible
        with pytest.raises(ValueError):
            plan(A, A)

    def test_backend_gate(self):
        from pyamg_tpu.sparse.spgemm_pallas import pallas_spgemm_supported
        from pyamg_tpu.sparse.pallas_kernels import pallas_available
        assert pallas_spgemm_supported() == (pallas_available()
                                             and jax.device_count() == 1)


# ---------------------------------------------------------------------------
# Banded-left masked-SpGEMM kernel (spgemm_dia)
# ---------------------------------------------------------------------------

from pyamg_tpu.sparse import spgemm_dia as _spd


def _banded_square(n, offsets, drop=0.1, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols, vals = [], [], []
    for off in offsets:
        i = np.arange(max(0, -off), min(n, n - off))
        keep = rng.random(i.size) > drop
        rows.append(i[keep])
        cols.append((i + off)[keep])
        vals.append(rng.standard_normal(keep.sum()))
    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n)).tocsr()
    A.sort_indices()
    return A


class TestBandedSpgemmInterpret:
    """Banded-left kernel correctness in the interpreter.

    The kernel is pure f32 FMA (no bf16 splits), so results must be
    BIT-IDENTICAL to f64-cast comparison against the XLA gather path only
    up to summation order — in practice exact on these cases.
    """

    def setup_method(self):
        _spd._INTERPRET[0] = True

    def teardown_method(self):
        _spd._INTERPRET[0] = False

    @pytest.mark.parametrize("case", ["5pt", "9pt", "wideA", "multitile"])
    def test_matches_xla_masked_product(self, case):
        if case == "5pt":
            A_csr = _banded_square(3000, [-50, -1, 0, 1, 50], seed=1)
            B_csr = _banded_random(3000, 900, 3, nnz_per_row=3, seed=2)
        elif case == "9pt":
            A_csr = _banded_square(
                2000, [-45, -44, -43, -1, 0, 1, 43, 44, 45], seed=3)
            B_csr = _banded_random(2000, 2000, 5, seed=4)
        elif case == "wideA":
            # A wider than tall: B rows beyond n_pad must still be read
            A_csr = _banded_square(2200, [-2, 0, 2, 700],
                                   seed=5).tocsr()[:1500]
            B_csr = _banded_random(2200, 500, 4, nnz_per_row=4, seed=6)
        else:
            A_csr = _banded_square(30000, [-1500, -1, 0, 1, 1500], seed=7)
            B_csr = _banded_random(30000, 10000, 6, seed=8)
        A = SparseELL.from_scipy(A_csr, dtype=np.float32)
        B = SparseELL.from_scipy(B_csr, dtype=np.float32)
        pat = pattern_spgemm(A_csr, B_csr, dtype=np.float32)
        plan = _spd.BandedSpgemmPlan(A, B, pat)
        assert plan.feasible, plan.describe()
        ref = masked_spgemm_ell(A, B, pat)
        out = plan(A, B)
        r = np.asarray(ref.data, dtype=np.float64)
        o = np.asarray(out.data, dtype=np.float64)
        assert np.abs(r - o).max() / (np.abs(r).max() or 1.0) < 1e-6
        C_true = A_csr.astype(np.float32) @ B_csr.astype(np.float32)
        got = out.to_scipy().astype(np.float64)
        assert (abs(got - C_true.astype(np.float64)).max()
                / (np.abs(r).max() or 1.0)) < 1e-5

    def test_infeasible_irregular_left(self):
        # an unstructured left operand has too many distinct offsets
        rng = np.random.default_rng(0)
        A_csr = sp.csr_matrix(rng.random((800, 800)) < 0.01,
                              dtype=np.float32)
        A_csr.data = rng.standard_normal(A_csr.nnz).astype(np.float32)
        A = SparseELL.from_scipy(A_csr, dtype=np.float32)
        pat = pattern_spgemm(A_csr, A_csr, dtype=np.float32)
        plan = _spd.BandedSpgemmPlan(A, A, pat)
        assert not plan.feasible
        with pytest.raises(ValueError):
            plan(A, A)

    def test_plan_reuse_fresh_data(self):
        A_csr = _banded_square(1000, [-30, 0, 30], seed=9)
        B_csr = _banded_random(1000, 400, 4, seed=10)
        pat = pattern_spgemm(A_csr, B_csr, dtype=np.float32)
        A1 = SparseELL.from_scipy(A_csr, dtype=np.float32)
        B1 = SparseELL.from_scipy(B_csr, dtype=np.float32)
        plan = _spd.BandedSpgemmPlan(A1, B1, pat)
        A2_csr = A_csr.copy()
        A2_csr.data = np.random.default_rng(11).standard_normal(A_csr.nnz)
        A2 = SparseELL.from_scipy(A2_csr, dtype=np.float32)
        out = plan(A2, B1)
        ref = masked_spgemm_ell(A2, B1, pat)
        r = np.asarray(ref.data, dtype=np.float64)
        o = np.asarray(out.data, dtype=np.float64)
        assert np.abs(r - o).max() / (np.abs(r).max() or 1.0) < 1e-6
