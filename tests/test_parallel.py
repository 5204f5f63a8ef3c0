"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

import pyamg_tpu
from pyamg_tpu.gallery import poisson
from pyamg_tpu.parallel import make_mesh, shard_solver


def conv_factor(res):
    res = np.asarray(res)
    return (res[-1] / res[0]) ** (1.0 / max(len(res) - 1, 1))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestSharded:
    def test_sharded_solve_matches_single(self):
        A = poisson((31, 33), format="csr")     # deliberately non-divisible
        b = np.random.default_rng(0).standard_normal(A.shape[0])
        ml = pyamg_tpu.smoothed_aggregation_solver(A, max_coarse=20)
        res1 = []
        x1 = ml.solve(b, tol=1e-10, maxiter=40, residuals=res1)

        sml = shard_solver(ml, n_devices=8)
        res2 = []
        x2 = sml.solve(b, tol=1e-10, maxiter=40, residuals=res2)
        assert np.allclose(x1, x2, atol=1e-8)
        assert abs(conv_factor(res1) - conv_factor(res2)) < 1e-6

    def test_sharded_accel_cg(self):
        A = poisson((24, 24), format="csr")
        b = np.random.default_rng(1).standard_normal(A.shape[0])
        ml = pyamg_tpu.ruge_stuben_solver(A, max_coarse=20)
        sml = shard_solver(ml, n_devices=8)
        x = sml.solve(b, tol=1e-10, maxiter=40, accel="cg")
        assert np.linalg.norm(b - A @ x) < 1e-8 * np.linalg.norm(b)

    def test_sharding_is_actually_distributed(self):
        A = poisson((16, 16), format="csr")
        ml = pyamg_tpu.ruge_stuben_solver(A, max_coarse=20)
        sml = shard_solver(ml, n_devices=8)
        data = sml.levels[0].A.data
        assert len(data.sharding.device_set) == 8

    def test_structured_sharded_matches_single(self):
        from pyamg_tpu.parallel import shard_structured_solver

        A = poisson((48, 48), format="csr")     # 2304 % 8 == 0
        ml = pyamg_tpu.smoothed_aggregation_solver(
            A, max_coarse=50, improve_candidates=None)
        b = np.random.default_rng(0).standard_normal(A.shape[0])
        x1 = ml.solve(b, tol=1e-10, maxiter=50, accel="cg")
        sml = shard_structured_solver(ml, n_devices=8, axis_name="rows", min_shard_rows=256)
        res = []
        x2 = sml.solve(b, tol=1e-10, maxiter=50, residuals=res)
        assert np.allclose(x1, x2, atol=1e-8)

    def test_mesh_sizes(self):
        mesh = make_mesh(4)
        assert mesh.devices.size == 4
        with pytest.raises(ValueError):
            make_mesh(10**6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedSmootherFidelity:
    """Round-2: every smoother kind survives sharding faithfully
    (VERDICT weak #6)."""

    def test_sharded_zebra_matches_single(self):
        from pyamg_tpu.relaxation.smoothing import change_smoothers

        A = poisson((32, 8), format="csr")      # every dim divisible by 8
        b = np.random.default_rng(0).standard_normal(A.shape[0])
        ml = pyamg_tpu.smoothed_aggregation_solver(
            A, max_coarse=400, max_levels=2, improve_candidates=None)
        change_smoothers(ml, ("zebra", {"axis": 0}), ("zebra", {"axis": 0}))
        res1 = []
        x1 = ml.solve(b, tol=1e-10, maxiter=40, residuals=res1)

        sml = shard_solver(ml, n_devices=8)
        res2 = []
        x2 = sml.solve(b, tol=1e-10, maxiter=40, residuals=res2)
        assert np.allclose(x1, x2, atol=1e-8)
        assert abs(conv_factor(res1) - conv_factor(res2)) < 1e-6

    def test_sharded_jacobi_ne_matches_single(self):
        from pyamg_tpu.relaxation.smoothing import change_smoothers

        A = poisson((24, 24), format="csr")     # 576 % 8 == 0 (no padding)
        b = np.random.default_rng(1).standard_normal(A.shape[0])
        ml = pyamg_tpu.smoothed_aggregation_solver(
            A, max_coarse=30, improve_candidates=None)
        change_smoothers(ml, "jacobi_ne", "jacobi_ne")
        res1 = []
        x1 = ml.solve(b, tol=1e-8, maxiter=60, residuals=res1)
        sml = shard_solver(ml, n_devices=8)
        res2 = []
        x2 = sml.solve(b, tol=1e-8, maxiter=60, residuals=res2)
        assert abs(conv_factor(res1) - conv_factor(res2)) < 1e-6
        assert np.allclose(x1, x2, atol=1e-7)

    def test_sharded_schwarz_matches_single(self):
        from pyamg_tpu.relaxation.smoothing import change_smoothers

        A = poisson((16, 16), format="csr")
        b = np.random.default_rng(2).standard_normal(A.shape[0])
        ml = pyamg_tpu.smoothed_aggregation_solver(
            A, max_coarse=30, improve_candidates=None)
        change_smoothers(ml, "schwarz", "schwarz")
        x1 = ml.solve(b, tol=1e-8, maxiter=60)
        sml = shard_solver(ml, n_devices=8)
        x2 = sml.solve(b, tol=1e-8, maxiter=60)
        assert np.allclose(x1, x2, atol=1e-7)

    def test_sharded_line_smoother_on_padded_level_raises(self):
        from pyamg_tpu.relaxation.smoothing import change_smoothers

        A = poisson((31, 7), format="csr")      # 217 not divisible by 8
        ml = pyamg_tpu.smoothed_aggregation_solver(
            A, max_coarse=100, max_levels=2, improve_candidates=None)
        change_smoothers(ml, ("zebra", {"axis": 0}), ("zebra", {"axis": 0}))
        with pytest.raises(ValueError, match="line smoother"):
            shard_solver(ml, n_devices=8)

    def test_structured_sharded_gmres_and_standalone(self):
        from pyamg_tpu.parallel import shard_structured_solver

        A = poisson((48, 48), format="csr")
        ml = pyamg_tpu.smoothed_aggregation_solver(
            A, max_coarse=50, improve_candidates=None)
        b = np.random.default_rng(3).standard_normal(A.shape[0])
        sml = shard_structured_solver(ml, n_devices=8, min_shard_rows=256)
        x1 = sml.solve(b, tol=1e-10, maxiter=50, accel="gmres")
        assert np.linalg.norm(b - A @ x1) < 1e-8 * np.linalg.norm(b)
        x2 = sml.solve(b, tol=1e-8, maxiter=60, accel=None)
        assert np.linalg.norm(b - A @ x2) < 1e-6 * np.linalg.norm(b)
        x3 = sml.solve(b, tol=1e-10, maxiter=50, accel="fgmres")
        assert np.linalg.norm(b - A @ x3) < 1e-8 * np.linalg.norm(b)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestShardedBlockHierarchies:
    """Round-2: BSR/BDIA hierarchies (elasticity RBMs, multi-candidate SA)
    shard faithfully through the padded-ELL path."""

    def test_sharded_elasticity_matches_single(self):
        from pyamg_tpu.gallery import linear_elasticity
        from pyamg_tpu.parallel import shard_solver

        A, B = linear_elasticity((16, 16))
        ml = pyamg_tpu.smoothed_aggregation_solver(A, B=B, max_coarse=40)
        b = np.random.default_rng(0).standard_normal(A.shape[0])
        res1 = []
        x1 = ml.solve(b, tol=1e-8, maxiter=40, residuals=res1)
        sml = shard_solver(ml, n_devices=8)
        res2 = []
        x2 = sml.solve(b, tol=1e-8, maxiter=40, residuals=res2)
        assert np.allclose(x1, x2, atol=1e-6)
        assert abs(conv_factor(res1) - conv_factor(res2)) < 1e-5

    def test_sharded_multicandidate_matches_single(self):
        from pyamg_tpu.gallery import stencil_grid, diffusion_stencil_2d
        from pyamg_tpu.parallel import shard_solver

        sten = diffusion_stencil_2d(epsilon=0.01, theta=0.0, type="FD")
        A = stencil_grid(sten, (24, 24), format="csr")
        n = A.shape[0]
        rng = np.random.default_rng(1)
        B = np.stack([np.ones(n), rng.random(n)], axis=1)
        ml = pyamg_tpu.smoothed_aggregation_solver(
            A, B=B, max_coarse=30, improve_candidates=None)
        b = rng.standard_normal(n)
        x1 = ml.solve(b, tol=1e-8, maxiter=40)
        sml = shard_solver(ml, n_devices=8)
        x2 = sml.solve(b, tol=1e-8, maxiter=40)
        assert np.allclose(x1, x2, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestDistributedSetup:
    """Round-3: the setup phase itself runs distributed (SURVEY §7 step 8).

    The structured hierarchy is CONSTRUCTED on the mesh — row-sharded
    diagonals, SPMD level builds, sharded comb-probe RAP — and must agree
    with the single-device build to reduction-reassociation accuracy."""

    def test_sharded_setup_matches_single_device(self):
        import jax.numpy as jnp
        from pyamg_tpu.aggregation.device_setup import structured_sa_setup
        from pyamg_tpu.parallel import structured_sa_setup_sharded

        A = poisson((48, 48), format="csr")
        ml_ref = structured_sa_setup(A, (48, 48), dtype=jnp.float64)
        ml_sh = structured_sa_setup_sharded(A, (48, 48), n_devices=8,
                                            dtype=jnp.float64)
        assert len(ml_ref.levels) == len(ml_sh.levels)
        for i, (lr, ls) in enumerate(zip(ml_ref.levels, ml_sh.levels)):
            assert lr.A.offsets == ls.A.offsets, f"level {i} offsets"
            dr = np.asarray(lr.A.diags)
            ds = np.asarray(ls.A.diags)
            err = np.abs(dr - ds).max() / max(np.abs(dr).max(), 1e-300)
            assert err < 1e-12, f"level {i} rel err {err}"
        # divisible levels stay row-sharded on the mesh (not replicated)
        spec0 = ml_sh.levels[0].A.diags.sharding.spec
        assert tuple(spec0) == (None, "rows")

    def test_sharded_setup_solves(self):
        from pyamg_tpu.parallel import structured_sa_setup_sharded

        A = poisson((48, 24), format="csr")
        ml = structured_sa_setup_sharded(A, (48, 24), n_devices=8,
                                         max_coarse=20)
        b = np.random.default_rng(0).standard_normal(A.shape[0])
        res = []
        ml.solve(b, tol=1e-6, maxiter=40, accel="cg", residuals=res)
        assert res[-1] / res[0] < 1e-6
