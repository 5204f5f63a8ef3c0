"""CR, CGNE, CGNR, steepest descent, minimal residual, BiCGStab.

Reference parity: pyamg/krylov/{_cr.py:12, _cgne.py:14, _cgnr.py:14,
_steepest_descent.py:11, _minimal_residual.py:11, _bicgstab.py:10} — same
contracts, each realized as a fused ``lax.while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ._common import (prepare, norm, finalize, make_rmatvec,
                      operator_jittable, run_core_jit, run_core_rmv_jit,
                      canonicalize_operator)

__all__ = ["cr", "cgne", "cgnr", "steepest_descent", "minimal_residual",
           "bicgstab", "bicgstab_init", "bicgstab_chunk",
           "cr_core", "steepest_descent_core", "minimal_residual_core",
           "bicgstab_core"]


def _run(cond, body, carry0, it_index):
    carry = jax.lax.while_loop(cond, body, carry0)
    return carry


def cr_core(mv, pre, x, b, tol_t, maxiter):
    """Traceable conjugate-residual core: (x, n_iters, res_buf) — same
    contract as cg_core, so it rides _raw_accel's fused hierarchy
    programs (multilevel.py:449) and run_core_jit."""
    r = pre(b - mv(x))
    p = r
    Ar = mv(r)
    Ap = Ar
    rAr = jnp.vdot(r, Ar)
    res_buf = jnp.zeros(maxiter + 1, dtype=jnp.real(b).dtype)
    res_buf = res_buf.at[0].set(norm(b - mv(x)))

    def body(carry):
        x, r, p, Ar, Ap, rAr, it, res_buf = carry
        MAp = pre(Ap)
        d = jnp.vdot(Ap, MAp)
        alpha = rAr / jnp.where(d == 0, 1, d)
        x = x + alpha * p
        r = r - alpha * MAp
        Ar = mv(r)
        rAr_new = jnp.vdot(r, Ar)
        beta = rAr_new / jnp.where(rAr == 0, 1, rAr)
        p = r + beta * p
        Ap = Ar + beta * Ap
        it = it + 1
        res_buf = res_buf.at[it].set(norm(r))
        return (x, r, p, Ar, Ap, rAr_new, it, res_buf)

    def cond(carry):
        it, res_buf = carry[-2], carry[-1]
        return (res_buf[it] > tol_t) & (it < maxiter)

    carry = _run(cond, body, (x, r, p, Ar, Ap, rAr, 0, res_buf), -2)
    return carry[0], carry[-2], carry[-1]


def cr(A, b, x0=None, tol=1e-5, maxiter=None, xtype=None, M=None,
       callback=None, residuals=None):
    """Conjugate residual method (Hermitian, possibly indefinite A)."""
    A, M, mv, pre, b, x, maxiter = prepare(A, b, x0, maxiter, M)
    normb = norm(b)
    tol_t = tol * jnp.where(normb == 0, 1.0, normb)
    if operator_jittable(A, M):
        x, it, res_buf = run_core_jit(cr_core, A, M, x, b, maxiter, tol_t)
    else:
        x, it, res_buf = cr_core(mv, pre, x, b, tol_t, maxiter)
    return finalize(x, res_buf, it + 1, float(tol_t), callback, residuals)


def cgnr_core(mv, rmv, pre, x, b, tol_t, maxiter):
    """Traceable CGNR core (left-preconditioned normal residual equations
    M A^H A x = M A^H b — reference _cgnr.py:157-186: z = M rhat,
    alpha = <z, rhat>/<Ap, Ap>, p = z + beta p)."""
    r = b - mv(x)
    rhat = rmv(r)         # A^H r
    z = pre(rhat)
    p = z
    zr = jnp.vdot(z, rhat)
    res_buf = jnp.zeros(maxiter + 1, dtype=jnp.real(b).dtype)
    res_buf = res_buf.at[0].set(norm(r))

    def body(carry):
        x, r, p, zr, it, res_buf = carry
        Ap = mv(p)
        d = jnp.vdot(Ap, Ap)
        alpha = zr / jnp.where(d == 0, 1, d)
        x = x + alpha * p
        r = r - alpha * Ap
        rhat = rmv(r)
        z = pre(rhat)
        zr_new = jnp.vdot(z, rhat)
        beta = zr_new / jnp.where(zr == 0, 1, zr)
        p = z + beta * p
        it = it + 1
        res_buf = res_buf.at[it].set(norm(r))
        return (x, r, p, zr_new, it, res_buf)

    def cond(carry):
        it, res_buf = carry[-2], carry[-1]
        return (res_buf[it] > tol_t) & (it < maxiter)

    carry = _run(cond, body, (x, r, p, zr, 0, res_buf), -2)
    return carry[0], carry[-2], carry[-1]


def _normal_dispatch(core, A, M, mv, pre, x, b, maxiter, tol_t, AH0):
    """Run a normal-equation core jitted when (A, A^H, M) all ride as
    pytree arguments; otherwise eagerly with make_rmatvec's closure."""
    AH = canonicalize_operator(AH0) if AH0 is not None else None
    if operator_jittable(A, M) and (
            (AH is not None and operator_jittable(AH))
            or (AH is None and hasattr(A, "rmatvec"))):
        return run_core_rmv_jit(core, A, AH, M, x, b, maxiter, tol_t)
    return core(mv, make_rmatvec(A), pre, x, b, tol_t, maxiter)


def cgnr(A, b, x0=None, tol=1e-5, maxiter=None, xtype=None, M=None,
         callback=None, residuals=None):
    """CG on the normal residual equations A^H A x = A^H b (CGLS;
    reference _cgnr.py:14).  ``M`` preconditions the NORMAL system
    (z = M A^H r), matching the reference."""
    import scipy.sparse as sp
    AH0 = A.conjugate().T.tocsr() if sp.issparse(A) else None
    A, M, mv, pre, b, x, maxiter = prepare(A, b, x0, maxiter, M)
    normb = norm(b)
    tol_t = tol * float(jnp.where(normb == 0, 1.0, normb))
    x, it, res_buf = _normal_dispatch(cgnr_core, A, M, mv, pre, x, b,
                                      maxiter, tol_t, AH0)
    return finalize(x, res_buf, it + 1, tol_t, callback, residuals)


def cgne_core(mv, rmv, pre, x, b, tol_t, maxiter):
    """Traceable CGNE core (Craig's method on M A A^H y = M b — reference
    _cgne.py:155-183: z = M r, p = A^H z + beta p, alpha = <z, r>/<p, p>)."""
    r = b - mv(x)
    z = pre(r)
    p = rmv(z)
    zr = jnp.vdot(z, r)
    res_buf = jnp.zeros(maxiter + 1, dtype=jnp.real(b).dtype)
    res_buf = res_buf.at[0].set(norm(r))

    def body(carry):
        x, r, p, zr, it, res_buf = carry
        pp = jnp.vdot(p, p)
        alpha = zr / jnp.where(pp == 0, 1, pp)
        x = x + alpha * p
        r = r - alpha * mv(p)
        z = pre(r)
        zr_new = jnp.vdot(z, r)
        beta = zr_new / jnp.where(zr == 0, 1, zr)
        p = rmv(z) + beta * p
        it = it + 1
        res_buf = res_buf.at[it].set(norm(r))
        return (x, r, p, zr_new, it, res_buf)

    def cond(carry):
        it, res_buf = carry[-2], carry[-1]
        return (res_buf[it] > tol_t) & (it < maxiter)

    carry = _run(cond, body, (x, r, p, zr, 0, res_buf), -2)
    return carry[0], carry[-2], carry[-1]


def cgne(A, b, x0=None, tol=1e-5, maxiter=None, xtype=None, M=None,
         callback=None, residuals=None):
    """CG on the normal error equations A A^H y = b (Craig's method;
    reference _cgne.py:14).  ``M`` preconditions the NORMAL system
    (z = M r), matching the reference."""
    import scipy.sparse as sp
    AH0 = A.conjugate().T.tocsr() if sp.issparse(A) else None
    A, M, mv, pre, b, x, maxiter = prepare(A, b, x0, maxiter, M)
    normb = norm(b)
    tol_t = tol * float(jnp.where(normb == 0, 1.0, normb))
    x, it, res_buf = _normal_dispatch(cgne_core, A, M, mv, pre, x, b,
                                      maxiter, tol_t, AH0)
    return finalize(x, res_buf, it + 1, tol_t, callback, residuals)


def steepest_descent_core(mv, pre, x, b, tol_t, maxiter):
    """Traceable preconditioned steepest-descent core: (x, n_iters,
    res_buf), cg_core contract."""
    r = b - mv(x)
    res_buf = jnp.zeros(maxiter + 1, dtype=jnp.real(b).dtype)
    res_buf = res_buf.at[0].set(norm(r))

    def body(carry):
        x, r, it, res_buf = carry
        z = pre(r)
        Az = mv(z)
        d = jnp.vdot(z, Az)
        alpha = jnp.vdot(z, r) / jnp.where(d == 0, 1, d)
        x = x + alpha * z
        r = r - alpha * Az
        it = it + 1
        res_buf = res_buf.at[it].set(norm(r))
        return (x, r, it, res_buf)

    def cond(carry):
        it, res_buf = carry[-2], carry[-1]
        return (res_buf[it] > tol_t) & (it < maxiter)

    carry = _run(cond, body, (x, r, 0, res_buf), -2)
    return carry[0], carry[-2], carry[-1]


def steepest_descent(A, b, x0=None, tol=1e-5, maxiter=None, xtype=None,
                     M=None, callback=None, residuals=None):
    """Preconditioned steepest descent (reference _steepest_descent.py:11)."""
    A, M, mv, pre, b, x, maxiter = prepare(A, b, x0, maxiter, M)
    normb = norm(b)
    tol_t = tol * jnp.where(normb == 0, 1.0, normb)
    if operator_jittable(A, M):
        x, it, res_buf = run_core_jit(steepest_descent_core, A, M, x, b,
                                      maxiter, tol_t)
    else:
        x, it, res_buf = steepest_descent_core(mv, pre, x, b, tol_t,
                                               maxiter)
    return finalize(x, res_buf, it + 1, float(tol_t), callback, residuals)


def minimal_residual_core(mv, pre, x, b, tol_t, maxiter):
    """Traceable minimal-residual core: (x, n_iters, res_buf), cg_core
    contract."""
    r = pre(b - mv(x))
    res_buf = jnp.zeros(maxiter + 1, dtype=jnp.real(b).dtype)
    res_buf = res_buf.at[0].set(norm(b - mv(x)))

    def body(carry):
        x, r, it, res_buf = carry
        Ar = pre(mv(r))
        d = jnp.vdot(Ar, Ar)
        alpha = jnp.vdot(Ar, r) / jnp.where(d == 0, 1, d)
        x = x + alpha * r
        r = r - alpha * Ar
        it = it + 1
        res_buf = res_buf.at[it].set(norm(r))
        return (x, r, it, res_buf)

    def cond(carry):
        it, res_buf = carry[-2], carry[-1]
        return (res_buf[it] > tol_t) & (it < maxiter)

    carry = _run(cond, body, (x, r, 0, res_buf), -2)
    return carry[0], carry[-2], carry[-1]


def minimal_residual(A, b, x0=None, tol=1e-5, maxiter=None, xtype=None,
                     M=None, callback=None, residuals=None):
    """Minimal residual iteration (reference _minimal_residual.py:11)."""
    A, M, mv, pre, b, x, maxiter = prepare(A, b, x0, maxiter, M)
    normb = norm(b)
    tol_t = tol * jnp.where(normb == 0, 1.0, normb)
    if operator_jittable(A, M):
        x, it, res_buf = run_core_jit(minimal_residual_core, A, M, x, b,
                                      maxiter, tol_t)
    else:
        x, it, res_buf = minimal_residual_core(mv, pre, x, b, tol_t,
                                               maxiter)
    return finalize(x, res_buf, it + 1, float(tol_t), callback, residuals)


def bicgstab_core(mv, pre, x, b, tol_t, maxiter):
    """Traceable BiCGStab core: (x, n_iters, res_buf)."""
    r = b - mv(x)
    rhat = r
    p = r
    rho = jnp.vdot(rhat, r)
    res_buf = jnp.zeros(maxiter + 1, dtype=jnp.real(b).dtype)
    res_buf = res_buf.at[0].set(norm(r))

    def body(carry):
        x, r, p, rho, it, res_buf = carry
        phat = pre(p)
        v = mv(phat)
        d = jnp.vdot(rhat, v)
        alpha = rho / jnp.where(d == 0, 1, d)
        s = r - alpha * v
        shat = pre(s)
        t = mv(shat)
        tt = jnp.vdot(t, t)
        omega = jnp.vdot(t, s) / jnp.where(tt == 0, 1, tt)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        rho_new = jnp.vdot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0, 1, rho)) * \
            (alpha / jnp.where(omega == 0, 1, omega))
        p = r + beta * (p - omega * v)
        it = it + 1
        res_buf = res_buf.at[it].set(norm(r))
        return (x, r, p, rho_new, it, res_buf)

    def cond(carry):
        it, res_buf = carry[-2], carry[-1]
        return (res_buf[it] > tol_t) & (it < maxiter)

    carry = _run(cond, body, (x, r, p, rho, 0, res_buf), -2)
    return carry[0], carry[-2], carry[-1]


def bicgstab_init(mv, pre, x, b, maxiter):
    """Initial BiCGStab carry for :func:`bicgstab_chunk`:
    ``(x, r, rhat, p, rho, it, res_buf)``."""
    r = b - mv(x)
    rho = jnp.vdot(r, r)
    res_buf = jnp.zeros(maxiter + 1, dtype=jnp.real(b).dtype)
    res_buf = res_buf.at[0].set(norm(r))
    return (x, r, r, r, rho, 0, res_buf)


def bicgstab_chunk(mv, pre, carry, tol_t, it_cap):
    """Continue BiCGStab from ``carry`` until ``res <= tol_t`` or ``it >=
    it_cap`` (both traced) — dispatch-bounded chunks with exact carried
    state, same rationale as :func:`~pyamg_tpu.krylov._cg.cg_chunk`.

    The carry keeps ``rhat`` (the shadow residual fixed at iteration 0), so
    the iterate sequence is identical to a single fused loop."""

    def body(c):
        x, r, rhat, p, rho, it, res_buf = c
        phat = pre(p)
        v = mv(phat)
        d = jnp.vdot(rhat, v)
        alpha = rho / jnp.where(d == 0, 1, d)
        s = r - alpha * v
        shat = pre(s)
        t = mv(shat)
        tt = jnp.vdot(t, t)
        omega = jnp.vdot(t, s) / jnp.where(tt == 0, 1, tt)
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        rho_new = jnp.vdot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0, 1, rho)) * \
            (alpha / jnp.where(omega == 0, 1, omega))
        p = r + beta * (p - omega * v)
        it = it + 1
        res_buf = res_buf.at[it].set(norm(r))
        return (x, r, rhat, p, rho_new, it, res_buf)

    def cond(c):
        it, res_buf = c[-2], c[-1]
        return (res_buf[it] > tol_t) & (it < it_cap)

    return jax.lax.while_loop(cond, body, carry)


def bicgstab(A, b, x0=None, tol=1e-5, maxiter=None, xtype=None, M=None,
             callback=None, residuals=None):
    """BiCGStab for nonsymmetric systems (reference _bicgstab.py:10)."""
    A, M, mv, pre, b, x, maxiter = prepare(A, b, x0, maxiter, M)
    normb = norm(b)
    tol_t = tol * float(jnp.where(normb == 0, 1.0, normb))
    if operator_jittable(A, M):
        x, it, res_buf = run_core_jit(bicgstab_core, A, M, x, b, maxiter,
                                      tol_t)
    else:
        x, it, res_buf = bicgstab_core(mv, pre, x, b, tol_t, maxiter)
    return finalize(x, res_buf, it + 1, tol_t, callback, residuals)
