"""Preconditioned conjugate gradient.

Reference parity: pyamg/krylov/_cg.py:11 — same contract, realized as one
``lax.while_loop`` XLA program with the preconditioner inlined.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ._common import prepare, norm, finalize

__all__ = ["cg"]


def cg(A, b, x0=None, tol=1e-5, maxiter=None, xtype=None, M=None,
       callback=None, residuals=None):
    """Solve SPD/HPD A x = b with preconditioned CG; returns (x, info)."""
    mv, pre, b, x, maxiter = prepare(A, b, x0, maxiter, M)
    normb = norm(b)
    normb = jnp.where(normb == 0, 1.0, normb)
    tol_t = tol * float(normb)

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
    x, _, _, _, _, it, res_buf = carry
    return finalize(x, res_buf, it + 1, tol_t, callback, residuals)
