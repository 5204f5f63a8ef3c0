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

    # chebyshev smoothing: ~4x cheaper per V-cycle than symmetric
    # multicolor GS on the TPU (no per-color masked matvecs) at equal
    # preconditioner quality on Poisson — measured 0.184 vs 0.727 ms per
    # PCG+V(1,1) iteration at 1M (device-resident slope, tunnel dispatch
    # excluded); end-to-end recorded solve 45.7 -> ~35 ms
    ml = pyamg_tpu.smoothed_aggregation_solver(
        A, max_coarse=500,
        presmoother="chebyshev",
        postsmoother="chebyshev",
        improve_candidates=None,
        op_dtype=jnp.float32)      # f32 device hierarchy (preconditioner)
    return ml


def make_tpu_solver(ml, A):
    """Fully-fused mixed-precision solve: the f64 defect-correction outer
    loop AND the f32 PCG inner loop compile into ONE XLA program — a single
    device dispatch and a single host fetch per solve."""
    from pyamg_tpu.sparse import SparseDIA
    from pyamg_tpu.krylov._cg import cg_core

    A64 = SparseDIA.from_scipy(A)          # f64 on device (outer residual)
    raw_cyc = ml._raw_cycle("V")
    hier = ml._dev()
    MAX_ROUNDS = 4

    # NOTE: the hierarchy and A64 are ARGUMENTS, not closure constants —
    # closure-captured arrays would be embedded into the serialized HLO.
    @jax.jit
    def full_solve(hier, A64, b64):
        normb = jnp.linalg.norm(b64)
        tol_abs = TOL * normb

        def mv32(v):
            return hier["As"][0].matvec(v)

        def pre(r):
            return raw_cyc(hier, jnp.zeros_like(r), r)

        def body(carry):
            x64, _nr_est, rounds, iters = carry
            r64 = b64 - A64.matvec(x64)          # one f64 matvec per round
            nr = jnp.linalg.norm(r64)
            r32 = r64.astype(jnp.float32)
            tol_t = (1e-6 * nr).astype(jnp.float32)
            dx32, it, res_buf = cg_core(mv32, pre, jnp.zeros_like(r32),
                                        r32, tol_t, INNER_MAXITER)
            x64 = x64 + dx32.astype(jnp.float64)
            # post-update residual estimate from the inner solve
            nr_est = res_buf[it].astype(jnp.float64)
            return (x64, nr_est, rounds + 1, iters + it)

        def cond(carry):
            _x64, nr_est, rounds, _iters = carry
            return (nr_est > 0.5 * tol_abs) & (rounds < MAX_ROUNDS)

        x0 = jnp.zeros_like(b64)
        carry = (x0, normb, 0, 0)
        x64, nr_est, rounds, iters = jax.lax.while_loop(cond, body, carry)
        return x64, rounds, iters

    def solve(b64):
        x64, rounds, iters = full_solve(hier, A64, b64)
        return x64, int(iters)     # the int() forces completion

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


def pallas_smoke():
    """Execution-verify every dtype ``pallas_dia_supported`` CLAIMS on the
    real attached TPU: dispatch the actual Pallas DIA kernel once per
    claimed dtype and check the result against a host reference.  A dtype
    the Mosaic compiler rejects raises here, loudly, instead of crashing a
    user's first dispatch (the round-3 d2a2a31 bug class: the gate claimed
    bf16, Mosaic rejected it at dispatch time, and no test caught it
    because CI runs the kernel interpret-mode only)."""
    from pyamg_tpu.sparse.pallas_kernels import (dia_matvec_pallas,
                                                 pallas_available,
                                                 pallas_dia_supported)

    if not pallas_available():
        return
    n = 1 << 18
    offsets = (-512, -1, 0, 1, 512)
    rng = np.random.default_rng(0)
    diags64 = rng.standard_normal((len(offsets), n))
    x64 = rng.standard_normal(n)
    checked = []
    for dt in (jnp.float32, jnp.bfloat16, jnp.float64):
        if not pallas_dia_supported(offsets, (n, n), dt):
            continue
        diags = jnp.asarray(diags64, dtype=dt)
        x = jnp.asarray(x64, dtype=dt)
        y = np.asarray(dia_matvec_pallas(diags, offsets, x), dtype=float)
        # host reference in the SAME precision as the kernel inputs
        d_h = np.asarray(diags, dtype=float)
        x_h = np.asarray(x, dtype=float)
        yref = np.zeros(n)
        for kk, off in enumerate(offsets):
            lo, hi = max(0, -off), min(n, n - off)
            yref[lo:hi] += d_h[kk, lo:hi] * x_h[lo + off:hi + off]
        scale = np.abs(yref).max() or 1.0
        # dtype-aware: the host reference is f64 from quantized inputs, so
        # a 2-byte kernel dtype (bf16 products, ~4e-3 rel) needs a loose
        # bound — otherwise a future Mosaic lifting the bf16 gate would
        # spuriously fail the exact scenario this smoke exists to verify
        itemsize = jnp.dtype(dt).itemsize
        tol = 1e-2 if itemsize <= 2 else (1e-5 if itemsize <= 4 else 1e-12)
        rel = float(np.abs(y - yref).max() / scale)
        assert rel < tol, f"pallas DIA kernel wrong for {dt}: rel={rel}"
        checked.append(str(jnp.dtype(dt)))
    return checked


def main():
    # dtype claims are execution-verified on the attached hardware FIRST —
    # if the support gate ever claims a dtype Mosaic rejects, the bench
    # fails here instead of publishing a number for a broken path
    pallas_dtypes_ok = pallas_smoke()

    A, b = build_problem()
    n = A.shape[0]
    ml = build_solver(A)
    solve = make_tpu_solver(ml, A)

    b64 = jax.device_put(jnp.asarray(b, dtype=jnp.float64))

    # warm-up: compile once (excluded from timing)
    _ = solve(b64)

    # tunnel-floor probe: median round-trip of a trivial dispatch + scalar
    # fetch.  Recorded next to the metric so a number captured inside one
    # of this VM's minutes-long degradation windows (measured: trivial
    # dispatches at 35-134 s) is identifiable as environment noise rather
    # than a code regression.
    probe = jax.jit(lambda v: v.sum())
    vprobe = jnp.full((64,), 1.0, dtype=jnp.float32)
    float(probe(vprobe))                  # compile once, outside timing
    floors = []
    for _ in range(5):
        t0 = time.time()
        float(probe(vprobe))
        floors.append(time.time() - t0)
    tunnel_floor_ms = sorted(floors)[len(floors) // 2] * 1000.0

    # device-resident solve time (completion forced by the iteration
    # count), best-of-3: single-shot numbers on this drifting 1-core VM
    # swing 0.5-3x run to run
    runs = []
    for _ in range(3):
        t0 = time.time()
        x_dev, inner_iters = solve(b64)
        runs.append(time.time() - t0)
    t_tpu = min(runs)

    # result transfer measured separately (tunnel D2H is not representative
    # of on-host TPU deployments)
    t0 = time.time()
    x = np.asarray(x_dev)
    t_xfer = time.time() - t0

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
            "result_transfer_s": round(t_xfer, 4),
            "cpu_scipy_solve_s": round(t_cpu, 3),
            "pcg_iterations": inner_iters,
            "per_iteration_ms": round(per_iter_ms, 2),
            "final_relres": relres,
            "levels": len(ml.levels),
            "operator_complexity": round(ml.operator_complexity(), 3),
            "pallas_dtypes_verified": pallas_dtypes_ok,
            "solve_s_runs": [round(r, 4) for r in runs],
            "tunnel_floor_ms": round(tunnel_floor_ms, 1),
            "degraded_vm": bool(tunnel_floor_ms > 150.0),
        },
    }))


if __name__ == "__main__":
    main()
