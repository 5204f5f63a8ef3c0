"""Headline benchmark: 1M-unknown 2D Poisson solved to 1e-10 rel. residual.

Matches BASELINE.json's metric ("V-cycle ms and DoFs/sec at 1M-unknown
Poisson") and config 3-ish: smoothed aggregation (structured grid fast path,
DIA operators), CG-preconditioned, float32 V-cycles on the TPU inside a
float64 defect-correction outer loop (TPU-native mixed precision: the f32
hierarchy is a preconditioner; accuracy comes from the f64 outer residual).

vs_baseline: the same hierarchy applied on CPU via scipy CSR ops (the
reference's substrate) preconditioning scipy CG — an apples-to-apples
CPU-vs-TPU throughput ratio.

Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

# persistent XLA compile cache: first-ever run pays the (slow, remote) TPU
# compile; later runs load the serialized executable
os.makedirs(os.path.join(os.path.dirname(__file__) or ".", ".jax_cache"),
            exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__) or ".",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


GRID = (1024, 1024)
TOL = 1e-10


def build_problem():
    from pyamg_tpu.gallery import poisson

    A = poisson(GRID, format="csr")
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = A @ rng.random(n)          # consistent RHS
    return A, b


def build_solver(A):
    import pyamg_tpu

    return pyamg_tpu.smoothed_aggregation_solver(
        A, max_coarse=500,
        presmoother=("gauss_seidel", {"sweep": "symmetric"}),
        postsmoother=("gauss_seidel", {"sweep": "symmetric"}),
        improve_candidates=None)


def tpu_solve(ml, A, b):
    """f64 defect correction around f32 device PCG; returns (x, seconds,
    n_inner_iters)."""
    import jax.numpy as jnp

    normb = np.linalg.norm(b)
    x = np.zeros_like(b)
    iters = 0
    t0 = time.time()
    for _ in range(4):
        r = b - A @ x                     # f64 on host
        relr = np.linalg.norm(r) / normb
        if relr < TOL:
            break
        res = []
        dx = ml.solve(r.astype(np.float32), tol=max(1e-6, TOL / relr / 10),
                      maxiter=60, accel="cg", residuals=res)
        iters += max(len(res) - 1, 0)
        x = x + np.asarray(dx, dtype=np.float64)
    elapsed = time.time() - t0
    return x, elapsed, iters


def cpu_reference_solve(ml, A, b):
    """Same hierarchy, applied with scipy CSR ops on the CPU (float64):
    stand-in for the reference's C++/scipy execution path."""
    import scipy.sparse as sp
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

    # warm-up: compile the device programs once (excluded from timing)
    _ = tpu_solve(ml, A, b)

    x, t_tpu, inner_iters = tpu_solve(ml, A, b)
    relres = float(np.linalg.norm(b - A @ x) / np.linalg.norm(b))
    assert relres < 5 * TOL, f"did not converge: {relres}"

    x_cpu, t_cpu = cpu_reference_solve(ml, A, b)

    dofs_per_sec = n / t_tpu
    vcycle_ms = t_tpu / max(inner_iters, 1) * 1000.0

    print(json.dumps({
        "metric": "poisson_1M_SA_PCG_to_1e-10_dofs_per_sec",
        "value": round(dofs_per_sec, 1),
        "unit": "DoF/s",
        "vs_baseline": round(t_cpu / t_tpu, 2),
        "detail": {
            "n": n,
            "tpu_solve_s": round(t_tpu, 3),
            "cpu_scipy_solve_s": round(t_cpu, 3),
            "pcg_iterations": inner_iters,
            "per_iteration_ms": round(vcycle_ms, 2),
            "final_relres": relres,
            "levels": len(ml.levels),
            "operator_complexity": round(ml.operator_complexity(), 3),
        },
    }))


if __name__ == "__main__":
    main()
