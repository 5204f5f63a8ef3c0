"""Gallery tests: stencils and assembled problems vs known values."""

import numpy as np
import pytest

from pyamg_tpu.gallery import (stencil_grid, poisson, gauge_laplacian,
                               diffusion_stencil_2d, diffusion_stencil_3d,
                               linear_elasticity, linear_elasticity_p1,
                               regular_triangle_mesh, sprand, load_example)


class TestStencilGrid:
    def test_1d(self):
        A = stencil_grid([-1, 2, -1], (4,)).toarray()
        expected = np.array([[2., -1, 0, 0], [-1, 2, -1, 0],
                             [0, -1, 2, -1], [0, 0, -1, 2]])
        assert np.allclose(A, expected)

    def test_2d_5pt(self):
        A = poisson((2, 3)).toarray()
        expected = np.array(
            [[4., -1, 0, -1, 0, 0], [-1, 4, -1, 0, -1, 0],
             [0, -1, 4, 0, 0, -1], [-1, 0, 0, 4, -1, 0],
             [0, -1, 0, -1, 4, -1], [0, 0, -1, 0, -1, 4]])
        assert np.allclose(A, expected)

    def test_symmetry(self):
        for grid in [(9,), (5, 7), (3, 4, 5)]:
            A = poisson(grid)
            assert abs(A - A.T).nnz == 0

    def test_fe(self):
        A = poisson((4, 4), type="FE")
        assert abs(A - A.T).nnz == 0
        # row sums are 0 in the interior (constant in nullspace of stencil)
        v = np.ones(16)
        interior = np.array([5, 6, 9, 10])
        assert np.allclose((A @ v)[interior], 0)

    def test_invalid(self):
        with pytest.raises(ValueError):
            stencil_grid([1, 2], (5,))     # even stencil
        with pytest.raises(ValueError):
            poisson((0,))


class TestDiffusion:
    def test_fd_reference_values(self):
        # published example values from the reference docstring
        # (pyamg/gallery/diffusion.py:62-66)
        sten = diffusion_stencil_2d(epsilon=0.0001, theta=np.pi / 6,
                                    type="FD")
        expected = np.array([[-0.2164847, -0.750025, 0.2164847],
                             [-0.250075, 2.0002, -0.250075],
                             [0.2164847, -0.750025, -0.2164847]])
        assert np.allclose(sten, expected, atol=1e-6)

    def test_fe_matches_reference_formula(self):
        # closed form from pyamg/gallery/diffusion.py:100-110
        for eps in (1.0, 0.01, 100.0):
            for theta in (0.0, np.pi / 7, np.pi / 3):
                C, S = np.cos(theta), np.sin(theta)
                CC, SS, CS = C * C, S * S, C * S
                a = (-1 * eps - 1) * CC + (-1 * eps - 1) * SS + \
                    (3 * eps - 3) * CS
                b = (2 * eps - 4) * CC + (-4 * eps + 2) * SS
                c = (-1 * eps - 1) * CC + (-1 * eps - 1) * SS + \
                    (-3 * eps + 3) * CS
                d = (-4 * eps + 2) * CC + (2 * eps - 4) * SS
                e = (8 * eps + 8) * CC + (8 * eps + 8) * SS
                expected = np.array([[a, b, c], [d, e, d],
                                     [c, b, a]]) / 6.0
                got = diffusion_stencil_2d(eps, theta, type="FE")
                assert np.allclose(got, expected, atol=1e-12), \
                    (eps, theta, got, expected)

    def test_isotropic_fd_is_poisson(self):
        sten = diffusion_stencil_2d(1.0, 0.0, type="FD")
        expected = np.array([[0., -1, 0], [-1, 4, -1], [0, -1, 0]])
        assert np.allclose(sten, expected)

    def test_3d_isotropic(self):
        sten = diffusion_stencil_3d(1.0, 1.0, type="FD")
        assert np.isclose(sten[1, 1, 1], 6.0)
        assert np.isclose(sten.sum(), 0.0)

    def test_3d_fe_rowsum_zero(self):
        sten = diffusion_stencil_3d(0.1, 10.0, theta=0.3, phi=0.2, psi=0.1,
                                    type="FE")
        assert np.isclose(sten.sum(), 0.0, atol=1e-10)
        assert sten.shape == (3, 3, 3)


class TestGauge:
    def test_hermitian_positive(self):
        A = gauge_laplacian(8, beta=0.1, seed=0)
        assert np.allclose(A.toarray(), A.toarray().conj().T)
        evals = np.linalg.eigvalsh(A.toarray())
        assert evals.min() > -1e-10


class TestElasticity:
    def test_q1_shapes_and_modes(self):
        A, B = linear_elasticity((4, 4))
        assert A.shape == (32, 32)
        assert B.shape == (32, 3)
        # SPD
        evals = np.linalg.eigvalsh(A.toarray())
        assert evals.min() > 0
        # rigid body modes annihilate A away from the Dirichlet boundary
        A8, B8 = linear_elasticity((8, 8))
        r = np.abs(np.asarray(A8 @ B8))          # (128, 3)
        nodes = np.arange(64).reshape(8, 8)
        deep = nodes[2:-2, 2:-2].reshape(-1)     # full interior stencils
        dofs = np.concatenate([2 * deep, 2 * deep + 1])
        assert np.abs(r[dofs]).max() < 1e-8 * abs(A8).max()

    def test_p1(self):
        V, E = regular_triangle_mesh(5, 5)
        A, B = linear_elasticity_p1(V, E)
        assert A.shape == (50, 50)
        assert B.shape == (50, 3)
        assert np.allclose(A.toarray(), A.toarray().T, atol=1e-8)
        # rigid body modes have (near) zero energy before boundary conditions
        for k in range(3):
            assert abs(B[:, k] @ (A.tocsr() @ B[:, k])) < 1e-6 * abs(A).max()


class TestMesh:
    def test_regular_triangle_mesh(self):
        V, E = regular_triangle_mesh(3, 4)
        assert V.shape == (12, 2)
        assert E.shape == (2 * 2 * 3, 3)
        assert E.max() < 12

    def test_invalid(self):
        with pytest.raises(ValueError):
            regular_triangle_mesh(1, 4)


class TestSprand:
    def test_basic(self):
        A = sprand(40, 30, 0.1, seed=0)
        assert A.shape == (40, 30)
        assert A.nnz > 0


class TestLoadExample:
    def test_generated_examples(self):
        for name in ("unit_square", "unit_cube", "helmholtz_2D",
                     "recirc_flow", "bar", "airfoil"):
            data = load_example(name)
            assert "A" in data
            assert data["A"].shape[0] > 0

    def test_unknown(self):
        with pytest.raises(ValueError):
            load_example("not_a_real_example")

    def test_knot(self):
        """Trefoil-tube surface Laplacian (ref example_data/knot.mat):
        239 unknowns, SPD after grounding, solvable by SA."""
        data = load_example("knot")
        A = data["A"]
        assert A.shape == (239, 239)
        assert abs(A - A.T).max() < 1e-12
        w = np.linalg.eigvalsh(A.toarray())
        assert w.min() > 0
        from pyamg_tpu import smoothed_aggregation_solver
        ml = smoothed_aggregation_solver(A, max_coarse=20)
        b = np.asarray(A @ np.ones(A.shape[0]))
        x = ml.solve(b, tol=1e-8, maxiter=60)
        assert np.linalg.norm(b - A @ np.asarray(x, dtype=float)) < \
            1e-5 * np.linalg.norm(b)

    def test_local_disc_galerkin_diffusion(self):
        """Degree-5 SIPG diffusion (ref example_data/
        local_disc_galerkin_diffusion.mat): 21-DoF element blocks, SPD,
        and a(u, v) = 0 for linear u against interior test functions."""
        data = load_example("local_disc_galerkin_diffusion")
        A = data["A"]
        nloc = data["elmt_blocksize"]
        assert nloc == 21
        assert A.shape[0] % nloc == 0
        assert abs(A - A.T).max() < 1e-10
        w = np.linalg.eigvalsh(A.toarray())
        assert w.min() > 0
        # interior consistency: residual of the linear function x vanishes
        # away from the Dirichlet boundary faces
        x = data["vertices"][:, 0]
        r = np.abs(np.asarray(A @ x))
        assert np.median(r) < 1e-9
