"""Device-true per-iteration slope for the standalone Krylov cores.

Separates the axon-tunnel dispatch floor from the real per-iteration cost
(the same protocol as the cycle-cost anatomy in ROUND3_NOTES.md): each
method runs the SAME compiled program twice — once to convergence at
tol=1e-10 (k1 iterations) and once with an unreachable tolerance (k2 =
iteration cap) — so

    slope = (t2 - t1) / (k2 - k1)      [device-true cost per iteration]
    floor = t1 - k1 * slope            [per-call dispatch/fetch overhead]

Wall times are best-of-N fresh dispatches.  Run on the TPU:

    python benchmarks/krylov_slope.py [--repeat 3]

Writes benchmarks/results/krylov_slope.json.
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

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TOL = 1e-10


def _problems():
    from pyamg_tpu.gallery import (poisson, stencil_grid,
                                   diffusion_stencil_2d, linear_elasticity,
                                   load_example)

    probs = {}
    probs["poisson2d_64"] = poisson((64, 64), format="csr")
    probs["poisson3d_16"] = poisson((16, 16, 16), format="csr")
    probs["aniso_64"] = stencil_grid(
        diffusion_stencil_2d(epsilon=0.01, theta=np.pi / 4, type="FD"),
        (64, 64), format="csr")
    A, _B = linear_elasticity((24, 24))
    probs["elasticity_24"] = A.tocsr()
    probs["recirc_flow"] = load_example("recirc_flow")["A"].tocsr()
    return probs


def _timed(fn, repeat):
    """Best-of-repeat wall plus the iteration count of the last run."""
    best, iters = np.inf, None
    for _ in range(repeat):
        res = []
        t0 = time.time()
        _x, _info = fn(res)
        t = time.time() - t0
        best = min(best, t)
        iters = len(res) - 1
    return best, iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from pyamg_tpu.krylov import bicgstab, gmres
    from pyamg_tpu.sparse import device_operator

    rng = np.random.default_rng(0)
    rows = []
    for name, A in _problems().items():
        b = np.asarray(A @ rng.random(A.shape[0]))
        Ad = device_operator(A)
        row = {"problem": name, "n": int(A.shape[0])}

        for meth, fn, kw, cap in [
                ("gmres", gmres, {"restrt": None}, 800),
                ("bicgstab", bicgstab, {}, 2000)]:
            def conv(res, fn=fn, kw=kw, cap=cap):
                return fn(Ad, b, tol=TOL, maxiter=cap, residuals=res, **kw)

            def full(res, fn=fn, kw=kw, cap=cap):
                # unreachable tolerance: the SAME program runs to the cap
                return fn(Ad, b, tol=1e-300, maxiter=cap, residuals=res,
                          **kw)

            conv(list())            # warm-up / compile
            full(list())
            t1, k1 = _timed(conv, args.repeat)
            t2, k2 = _timed(full, args.repeat)
            if k2 == k1:            # converged below 1e-300?! cap too low
                slope = float("nan")
                floor = float("nan")
            else:
                slope = (t2 - t1) / (k2 - k1)
                floor = t1 - k1 * slope
            row[f"{meth}_wall_s"] = round(t1, 4)
            row[f"{meth}_iters"] = k1
            row[f"{meth}_slope_us_per_iter"] = round(slope * 1e6, 2)
            row[f"{meth}_dispatch_floor_ms"] = round(floor * 1e3, 2)
            row[f"{meth}_cap_wall_s"] = round(t2, 4)
            row[f"{meth}_cap_iters"] = k2
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"protocol": "slope = (t(cap) - t(conv)) / (cap_iters - "
                       "conv_iters), same compiled program, best-of-"
                       f"{args.repeat} fresh dispatches",
           "tol": TOL, "rows": rows}
    path = os.path.join(os.path.dirname(__file__), "results",
                        "krylov_slope.json")
    json.dump(out, open(path, "w"), indent=1)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
