"""Preconditioned conjugate gradient.

Reference parity: pyamg/krylov/_cg.py:11 — same contract, realized as one
``lax.while_loop`` XLA program with the preconditioner inlined.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ._common import prepare, norm, finalize

__all__ = ["cg", "cg_core"]


def cg_core(mv, pre, x, b, tol_t, maxiter):
    """Traceable PCG core: (x, n_iters, res_buf).  ``tol_t`` is a traced
    absolute tolerance so solves at different tolerances share one compile."""

    def body(carry):
        x, r, z, p, rz, it, res_buf = carry
        Ap = mv(p)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(pAp == 0, 1, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z = pre(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1, rz)
        p = z + beta * p
        it = it + 1
        res_buf = res_buf.at[it].set(norm(r))
        return (x, r, z, p, rz_new, it, res_buf)

    def cond(carry):
        x, r, z, p, rz, it, res_buf = carry
        return (res_buf[it] > tol_t) & (it < maxiter)

    r = b - mv(x)
    z = pre(r)
    p = z
    rz = jnp.vdot(r, z)
    res_buf = jnp.zeros(maxiter + 1, dtype=jnp.real(b).dtype)
    res_buf = res_buf.at[0].set(norm(r))

    carry = jax.lax.while_loop(cond, body, (x, r, z, p, rz, 0, res_buf))
    x = carry[0]
    it = carry[-2]
    res_buf = carry[-1]
    return x, it, res_buf


def cg(A, b, x0=None, tol=1e-5, maxiter=None, xtype=None, M=None,
       callback=None, residuals=None):
    """Solve SPD/HPD A x = b with preconditioned CG; returns (x, info)."""
    mv, pre, b, x, maxiter = prepare(A, b, x0, maxiter, M)
    normb = norm(b)
    normb = jnp.where(normb == 0, 1.0, normb)
    tol_t = tol * normb
    x, it, res_buf = cg_core(mv, pre, x, b, tol_t, maxiter)
    return finalize(x, res_buf, it + 1, float(tol_t), callback, residuals)
