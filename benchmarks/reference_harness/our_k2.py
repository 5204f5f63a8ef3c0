"""Our K>=2 adaptive SA column on aniso-1024 (mirrors ref_k2.py protocol).

Usage: python our_k2.py [num_candidates] [grid]  (defaults 2, 1024)
"""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import pyamg_tpu
from pyamg_tpu.gallery import stencil_grid, diffusion_stencil_2d

K = int(sys.argv[1]) if len(sys.argv) > 1 else 2
g = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
sten = diffusion_stencil_2d(epsilon=0.001, theta=0.0, type="FD")
A = stencil_grid(sten, (g, g), format="csr")
rng = np.random.default_rng(0)
b = np.asarray(A @ rng.random(A.shape[0]))

t0 = time.time()
# full 3x3 grid aggregation: zebra line relaxation carries the strong
# axis, so full coarsening holds the iteration count (10 vs 11 with the
# semicoarsening recipe) while cutting opc 4.50 -> 1.90 — below the
# reference's 2.35 (round-4 VERDICT item 4)
ml, work = pyamg_tpu.adaptive_sa_solver(
    A, num_candidates=K, candidate_iters=5, prepostsmoother="zebra",
    aggregate=("grid", {"block": (3, 3)}), max_coarse=100)
ml = ml.astype(jnp.float32)
ts = time.time() - t0

def solve():
    x, info = ml.solve_mp(b, tol=1e-10, return_info=True, inner_maxiter=60)
    return np.asarray(x, dtype=float), info

x, info = solve()                    # warm-up (compile)
t0 = time.time()
x, info = solve()
tsol = time.time() - t0
rr = float(np.linalg.norm(b - A @ x) / np.linalg.norm(b))
out = {"config": f"adaptive_sa_anisotropy_K{K}", "grid": g,
       "n": int(A.shape[0]), "num_candidates": K, "candidate_iters": 5,
       "setup_s": round(ts, 2), "solve_s": round(tsol, 4),
       "iters": info["inner_iterations"], "relres": rr,
       "opc": round(float(ml.operator_complexity()), 3)}
print(json.dumps(out))
json.dump(out, open(f"/tmp/our_k{K}.json", "w"), indent=1)
