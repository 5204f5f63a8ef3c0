"""Profiling / observability.

Reference parity + upgrade (SURVEY.md §5 "Tracing/profiling"): the reference
has only residual histories and complexity metrics; here we add wall-clock
breakdowns of the compiled solve phase, an XLA trace hook
(``jax.profiler``), and per-level spectra (reference util/utils.py:908
``hierarchy_spectrum``).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["profile_cycles", "trace", "hierarchy_spectrum", "solve_timings"]


@contextlib.contextmanager
def trace(logdir):
    """Capture an XLA device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_cycles(ml, n_cycles=20, cycle="V", warmup=2, dtype=None):
    """Wall-clock one compiled cycle (median over ``n_cycles``)."""
    import jax
    import jax.numpy as jnp

    A = ml.levels[0].A
    n = A.shape[0]
    dt = dtype or A.dtype
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(n), dtype=dt)
    x = jnp.zeros_like(b)
    fn = ml.cycle_fn(cycle)
    for _ in range(warmup):
        x = fn(x, b)
    _ = float(jnp.sum(x))
    t0 = time.time()
    for _ in range(n_cycles):
        x = fn(x, b)
    _ = float(jnp.sum(x))
    per_cycle = (time.time() - t0) / n_cycles
    nnz = sum(l.nnz for l in ml.levels)
    return {
        "cycle": cycle,
        "seconds_per_cycle": per_cycle,
        "dofs_per_second": n / per_cycle,
        "nnz_throughput": nnz / per_cycle,
    }


def solve_timings(ml, b, tol=1e-8, maxiter=100, accel="cg"):
    """Timed solve: returns (x, dict with setup-free timing breakdown)."""
    t0 = time.time()
    res = []
    x = ml.solve(np.asarray(b), tol=tol, maxiter=maxiter, accel=accel,
                 residuals=res)
    total = time.time() - t0
    iters = max(len(res) - 1, 1)
    return x, {
        "total_seconds": total,
        "iterations": iters,
        "seconds_per_iteration": total / iters,
        "residuals": np.asarray(res),
    }


def hierarchy_spectrum(ml, k=6):
    """Extremal eigenvalue estimates per level (reference
    util/utils.py:908)."""
    import scipy.sparse.linalg as spla

    out = []
    for lvl in ml.levels:
        A = lvl.A_csr
        n = A.shape[0]
        if n <= 200:
            evals = np.linalg.eigvals(A.toarray())
            out.append({"min": complex(evals[np.argmin(np.abs(evals))]),
                        "max": complex(evals[np.argmax(np.abs(evals))]),
                        "n": n})
        else:
            try:
                lmax = spla.eigs(A, k=1, which="LM",
                                 return_eigenvectors=False, maxiter=200)
                out.append({"min": None, "max": complex(lmax[0]), "n": n})
            except Exception:
                out.append({"min": None, "max": None, "n": n})
    return out
