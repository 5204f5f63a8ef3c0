"""Classical (Ruge-Stuben) AMG solver constructor.

Reference parity: pyamg/classical/classical.py (``ruge_stuben_solver`` :22,
``extend_hierarchy`` :120).  Setup is staged on host (strength → C/F split →
direct interpolation → Galerkin RAP per level); the resulting hierarchy is a
device pytree executed by the compiled cycle in multilevel.py.
"""

from __future__ import annotations

import numpy as np

from ..multilevel import MultilevelSolver, Level
from ..relaxation.smoothing import change_smoothers
from ..strength import (classical_strength_of_connection,
                        symmetric_strength_of_connection,
                        evolution_strength_of_connection,
                        distance_strength_of_connection,
                        energy_based_strength_of_connection,
                        algebraic_distance, affinity_distance)
from ..util.utils import unpack_arg, to_csr
from . import split
from .interpolate import direct_interpolation, standard_interpolation

__all__ = ["ruge_stuben_solver"]


def _strength_matrix(A, flag):
    fn, kwargs = unpack_arg(flag)
    if fn == "classical":
        return classical_strength_of_connection(A, **kwargs)
    if fn == "symmetric":
        return symmetric_strength_of_connection(A, **kwargs)
    if fn in ("evolution", "ode"):
        return evolution_strength_of_connection(A, **kwargs)
    if fn == "distance":
        return distance_strength_of_connection(A, **kwargs)
    if fn == "energy_based":
        return energy_based_strength_of_connection(A, **kwargs)
    if fn == "algebraic_distance":
        return algebraic_distance(A, **kwargs)
    if fn == "affinity":
        return affinity_distance(A, **kwargs)
    if fn is None:
        S = A.copy()
        return S
    raise ValueError(f"unrecognized strength of connection method {fn!r}")


def ruge_stuben_solver(A, strength=("classical", {"theta": 0.25}),
                       CF="RS", interpolation="direct",
                       presmoother=("gauss_seidel", {"sweep": "symmetric"}),
                       postsmoother=("gauss_seidel", {"sweep": "symmetric"}),
                       max_levels=10, max_coarse=500, keep=False,
                       coarse_solver="pinv", coarse_filter=None, **kwargs):
    """Create a classical AMG solver (multilevel hierarchy).

    Examples
    --------
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.classical import ruge_stuben_solver
    >>> import numpy as np
    >>> A = poisson((10, 10), format='csr')
    >>> ml = ruge_stuben_solver(A, max_coarse=3)
    """
    grid_meta = getattr(A, "grid", None)     # before format conversion
    A = to_csr(A).astype(A.dtype)
    if A.shape[0] != A.shape[1]:
        raise ValueError("expected square matrix")

    levels = [Level()]
    levels[0].A_csr = A
    if grid_meta is None and isinstance(CF, tuple):
        grid_meta = unpack_arg(CF)[1].get("grid")
    levels[0].grid = tuple(grid_meta) if grid_meta is not None else None

    while (len(levels) < max_levels
           and levels[-1].A_csr.shape[0] > max_coarse):
        n_prev = levels[-1].A_csr.shape[0]
        _extend_hierarchy(levels, strength, CF, interpolation, keep,
                          coarse_filter)
        if levels[-1].A_csr.shape[0] == n_prev:
            break   # coarsening stalled

    # finalize: best device representation per operator (DIA/dense/ELL);
    # op_dtype (TPU addition, same as smoothed_aggregation_solver) builds
    # the device hierarchy directly in that dtype for mixed-precision use
    from ..sparse import device_operator

    op_dtype = kwargs.pop("op_dtype", None)
    from ..util.staging import staging
    with staging():
        for lvl in levels:
            lvl.A = device_operator(lvl.A_csr, dtype=op_dtype)
            if hasattr(lvl, "P_csr"):
                pr = _cpt_embedded_transfers(lvl, dtype=op_dtype)
                if pr is not None:
                    lvl.P, lvl.R = pr
                else:
                    lvl.P = device_operator(lvl.P_csr, dtype=op_dtype)
                    lvl.R = device_operator(lvl.R_csr, dtype=op_dtype)

    ml = MultilevelSolver(levels, coarse_solver=coarse_solver)
    if op_dtype is not None:
        ml._op_dtype = op_dtype
    change_smoothers(ml, presmoother, postsmoother)
    return ml


def _extend_hierarchy(levels, strength, CF, interpolation, keep,
                      coarse_filter=None):
    """One coarsening step (reference classical.py:120)."""
    A = levels[-1].A_csr

    C = _strength_matrix(A, strength)

    fn, kwargs = unpack_arg(CF)
    cgrid = None
    if fn == "grid":
        grid = getattr(levels[-1], "grid", None) or kwargs.get("grid")
        if grid is not None and int(np.prod(grid)) == A.shape[0] \
                and len(levels) == 1:
            splitting, cgrid = split.grid_splitting(grid)
        else:
            # coarse levels (or missing metadata): parallel PMIS fallback
            splitting = split.PMIS(C)
    elif fn == "RS":
        splitting = split.RS(C, **kwargs)
    elif fn == "PMIS":
        splitting = split.PMIS(C, **kwargs)
    elif fn == "PMISc":
        splitting = split.PMISc(C, **kwargs)
    elif fn == "CLJP":
        splitting = split.CLJP(C, **kwargs)
    elif fn == "CLJPc":
        splitting = split.CLJPc(C, **kwargs)
    elif fn == "MIS":
        splitting = split.MIS(C, **kwargs)
    elif fn == "CR":
        # compatible relaxation runs on A itself, not the strength graph
        from .cr import CR as _CR

        splitting = _CR(A, **kwargs)
    else:
        raise ValueError(f"unknown C/F splitting method {CF!r}")

    if splitting.sum() == 0 or splitting.sum() == len(splitting):
        # degenerate split: stop coarsening by making everything C
        return

    ifn, ikwargs = unpack_arg(interpolation)
    if ifn == "direct":
        P = direct_interpolation(A, C, splitting, **ikwargs)
    elif ifn == "standard":
        P = standard_interpolation(A, C, splitting, **ikwargs)
    else:
        raise ValueError(f"unknown interpolation method {interpolation!r}")

    R = P.T.tocsr()

    lvl = levels[-1]
    lvl.P_csr = P
    lvl.R_csr = R
    lvl.splitting = np.asarray(splitting)   # C-point ids for the embedded
    if keep:                                # DIA transfer form (finalize)
        lvl.C = C

    A_coarse = (R @ A @ P).tocsr()
    A_coarse.eliminate_zeros()
    if coarse_filter:
        # drop weak Galerkin fill-in, lumping it onto the diagonal
        # (keeps row sums: preserves the near-nullspace action;
        # ≙ util/utils filter_matrix_rows, reference util/utils.py:2009) —
        # controls the coarse-operator densification classical AMG shows on
        # rotated anisotropy, keeping coarse levels on the DIA fast path
        from ..util.utils import filter_matrix_rows

        theta = coarse_filter if isinstance(coarse_filter, float) \
            else 1e-2
        A_coarse = filter_matrix_rows(A_coarse, theta, lump=True)
    levels.append(Level())
    levels[-1].A_csr = A_coarse
    levels[-1].grid = cgrid


def _cpt_embedded_transfers(lvl, dtype=None, max_offsets=96):
    """Fine-embedded DIA form of a classical-AMG transfer pair.

    Re-indexing P's coarse columns to the C-points' fine positions makes the
    prolongation an (n x n) stencil operator (banded exactly where the level
    is banded), so applying P/R costs one DIA matvec plus an n_c-sized
    scatter/gather instead of a gather over every stored entry — ~7x faster
    at 1M rows.  Returns None when the level has no splitting or the
    embedded pattern is not banded enough (device_operator ELL fallback).
    """
    from ..sparse.embed import embedded_dia_transfers

    splitting = getattr(lvl, "splitting", None)
    if splitting is None:
        return None
    cpts = np.flatnonzero(np.asarray(splitting))
    # R_csr is the PLAIN transpose P.T (classical.py Galerkin build) — the
    # embedded restriction must match it, so no conjugation even for
    # complex matrices
    return embedded_dia_transfers(lvl.P_csr, cpts, dtype=dtype,
                                  max_offsets=max_offsets,
                                  restrict="transpose")
