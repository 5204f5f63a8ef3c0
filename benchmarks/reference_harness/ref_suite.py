"""Reference pyamg (CPU, f64) on the five BASELINE configs."""
import json
import time

import numpy as np

import ref_harness  # noqa: F401
import pyamg
from pyamg.gallery import poisson, stencil_grid, linear_elasticity
from pyamg.gallery.diffusion import diffusion_stencil_2d

out = json.load(open("/tmp/ref_suite.json")) if __import__("os").path.exists("/tmp/ref_suite.json") else {}


def run(name, build, accel="cg", tol=1e-10, maxiter=400, rhs="smooth"):
    # A FRESH rng per config: the RHS is identical no matter which configs
    # ran (or were resumed) before, and matches benchmarks/suite.py exactly
    # ("smooth" = A @ rng.random, as suite.py builds 1/2/3/5; "normal" =
    # rng.standard_normal, as suite.py build4 does for elasticity).
    rng = np.random.default_rng(0)
    t0 = time.time()
    A, ml = build()
    ts = time.time() - t0
    if rhs == "normal":
        b = rng.standard_normal(A.shape[0])
    else:
        b = np.asarray(A @ rng.random(A.shape[0])).ravel()
    res = []
    t0 = time.time()
    x = ml.solve(b, tol=tol, accel=accel, maxiter=maxiter, residuals=res)
    tsol = time.time() - t0
    rr = float(np.linalg.norm(b - A @ x) / np.linalg.norm(b))
    out[name] = dict(setup_s=round(ts, 2), solve_s=round(tsol, 3),
                     iters=len(res) - 1, relres=rr,
                     opc=round(float(ml.operator_complexity()), 3))
    print(name, out[name], flush=True)
    json.dump(out, open("/tmp/ref_suite.json", "w"), indent=1)


if "classical_poisson_500" not in out:
    run("classical_poisson_500",
    lambda: (lambda A: (A, pyamg.ruge_stuben_solver(A)))(
        poisson((500, 500), format="csr")))

if "anisotropic_1024_classical" not in out:
    run("anisotropic_1024_classical",
    lambda: (lambda A: (A, pyamg.ruge_stuben_solver(
        A, strength=("evolution", {"k": 2, "epsilon": 4.0}))))(
        stencil_grid(diffusion_stencil_2d(epsilon=0.01, theta=np.pi / 4,
                                          type="FD"),
                     (1024, 1024), format="csr")))

if "poisson3d_64_sa_chebyshev" not in out:
    run("poisson3d_64_sa_chebyshev",
    lambda: (lambda A: (A, pyamg.smoothed_aggregation_solver(
        A, presmoother=("chebyshev", {}), postsmoother=("chebyshev", {}),
        improve_candidates=None)))(
        poisson((64, 64, 64), format="csr")))


def build_elasticity():
    A, B = linear_elasticity((100, 100))
    ml = pyamg.smoothed_aggregation_solver(A.tobsr(blocksize=(2, 2)), B=B,
                                           max_coarse=100)
    return A.tocsr(), ml


if "elasticity_rbm_sa" not in out:
    run("elasticity_rbm_sa", build_elasticity, maxiter=400, rhs="normal")


def build_elasticity_1m():
    # mirrors suite.py config 4b: energy-min prolongation smoothing on RBM
    # candidates (the kernel-densest reference setup path, smooth.py:904)
    A, B = linear_elasticity((724, 724))      # 2*724^2 = 1,048,352 DoF
    ml = pyamg.smoothed_aggregation_solver(
        A.tobsr(blocksize=(2, 2)), B=B, max_coarse=100,
        smooth=("energy", {"maxiter": 2}))
    return A.tocsr(), ml


if "elasticity_1m_energy_sa" not in out:
    run("elasticity_1m_energy_sa", build_elasticity_1m, maxiter=400,
        rhs="normal")


def build_adaptive():
    sten = diffusion_stencil_2d(epsilon=0.001, theta=0.0, type="FD")
    A = stencil_grid(sten, (1024, 1024), format="csr")
    ml, work = pyamg.aggregation.adaptive_sa_solver(
        A, num_candidates=2, max_coarse=100)
    return A, ml


if "adaptive_sa_anisotropy_1024" not in out:
    run("adaptive_sa_anisotropy_1024", build_adaptive)
print("ALL DONE")
