"""Root-node smoothed aggregation solver.

Reference parity: pyamg/aggregation/rootnode.py (``rootnode_solver`` :33,
``extend_hierarchy`` :316): like SA but each aggregate keeps its root node's
identity row in P (C-point injection), coarse candidates by injection
``P_I^T B``, and energy-minimization prolongation smoothing with the
root-node constraint (``get_Cpt_params`` util/utils.py:1469, ``scale_T``
:1366).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..multilevel import MultilevelSolver, Level
from ..relaxation.smoothing import change_smoothers
from ..util.utils import (unpack_arg, to_csr, levelize_strength_or_aggregation,
                          levelize_smooth_or_improve_candidates,
                          relaxation_as_linear_operator, get_Cpt_params,
                          scale_T)
from .aggregation import _strength, _aggregate
from .tentative import fit_candidates
from .smooth import energy_prolongation_smoother

__all__ = ["rootnode_solver"]


def rootnode_solver(A, B=None, BH=None, symmetry="hermitian",
                    strength="symmetric", aggregate="standard",
                    smooth=("energy", {"krylov": "cg", "degree": 1,
                                       "maxiter": 4}),
                    presmoother=("block_gauss_seidel",
                                 {"sweep": "symmetric"}),
                    postsmoother=("block_gauss_seidel",
                                  {"sweep": "symmetric"}),
                    improve_candidates=(("block_gauss_seidel",
                                         {"sweep": "symmetric",
                                          "iterations": 4}), None),
                    max_levels=10, max_coarse=500, keep=False,
                    coarse_solver="pinv", **kwargs):
    """Create a root-node SA solver (reference rootnode.py:33).

    Examples
    --------
    >>> import numpy as np
    >>> from pyamg_tpu.gallery import poisson
    >>> from pyamg_tpu.aggregation import rootnode_solver
    >>> A = poisson((16, 16), format='csr')
    >>> ml = rootnode_solver(A, max_coarse=20)
    >>> b = np.ones(A.shape[0])
    >>> res = []
    >>> x = ml.solve(b, tol=1e-8, residuals=res)
    >>> res[-1] < 1e-8 * res[0]
    True
    """
    if symmetry not in ("hermitian", "symmetric", "nonsymmetric"):
        raise ValueError("invalid symmetry")

    A_in = A
    blocksize = 1
    if sp.issparse(A_in) and A_in.format == "bsr":
        blocksize = A_in.blocksize[0]
    A = to_csr(A_in)
    n = A.shape[0]

    if B is None:
        B = np.kron(np.ones((n // blocksize, 1), dtype=A.dtype),
                    np.eye(blocksize, dtype=A.dtype))
    else:
        B = np.asarray(B, dtype=A.dtype)
        if B.ndim == 1:
            B = B[:, None]

    if symmetry == "nonsymmetric":
        BH_arr = B.copy() if BH is None else np.asarray(BH, dtype=A.dtype)
    else:
        BH_arr = None

    max_levels, max_coarse, strength = levelize_strength_or_aggregation(
        strength, max_levels, max_coarse)
    max_levels, max_coarse, aggregate = levelize_strength_or_aggregation(
        aggregate, max_levels, max_coarse)
    improve_candidates = levelize_smooth_or_improve_candidates(
        improve_candidates, max_levels)
    smooth = levelize_smooth_or_improve_candidates(smooth, max_levels)

    levels = [Level()]
    levels[0].A_csr = A
    levels[0].A_bsr = sp.bsr_matrix(A_in) if blocksize > 1 else None
    levels[0].B = B
    levels[0].blocksize = blocksize
    levels[0].symmetry = symmetry
    if symmetry == "nonsymmetric":
        levels[0].BH = BH_arr

    while (len(levels) < max_levels
           and levels[-1].A_csr.shape[0] // max(levels[-1].blocksize, 1)
           > max_coarse):
        n_prev = levels[-1].A_csr.shape[0]
        _extend_rootnode(levels, strength, aggregate, smooth,
                         improve_candidates, keep, symmetry)
        if levels[-1].A_csr.shape[0] == n_prev:
            break

    from ..sparse import device_operator
    from ..sparse.embed import root_embedded_transfers

    op_dtype = kwargs.pop("op_dtype", None)
    from ..util.staging import staging
    with staging():
        for lvl in levels:
            lvl.A = device_operator(lvl.A_csr, dtype=op_dtype)
            if hasattr(lvl, "P_csr"):
                emb = root_embedded_transfers(lvl, dtype=op_dtype)
                if emb is not None:
                    lvl.P, lvl.R = emb
                else:
                    lvl.P = device_operator(lvl.P_csr, dtype=op_dtype)
                    lvl.R = device_operator(lvl.R_csr, dtype=op_dtype)

    ml = MultilevelSolver(levels, coarse_solver=coarse_solver)
    if op_dtype is not None:
        ml._op_dtype = op_dtype
    change_smoothers(ml, presmoother, postsmoother)
    return ml


def _extend_rootnode(levels, strength, aggregate, smooth, improve_candidates,
                     keep, symmetry):
    lvl = levels[-1]
    A = lvl.A_csr
    B = lvl.B
    bs = lvl.blocksize
    i = len(levels) - 1
    A_for_strength = lvl.A_bsr if (bs > 1 and lvl.A_bsr is not None) else A

    ic = improve_candidates[i]
    if ic is not None:
        b0 = np.zeros((A.shape[0], 1), dtype=A.dtype)
        op = relaxation_as_linear_operator(ic, A, b0)
        B = np.column_stack([op @ B[:, k] for k in range(B.shape[1])])
        lvl.B = B

    C = _strength(A_for_strength, B, strength[i])
    AggOp, Cnodes = _aggregate(C, A_for_strength, B, aggregate[i])
    if AggOp.shape[1] == 0:
        return
    if Cnodes is None:
        # matching-based aggregation has no natural roots: pick the max-|B|
        # node per aggregate
        Acsc = AggOp.tocsc()
        Cnodes = np.array([
            Acsc.indices[Acsc.indptr[a]:Acsc.indptr[a + 1]][
                int(np.argmax(np.abs(
                    B[Acsc.indices[Acsc.indptr[a]:Acsc.indptr[a + 1]], 0])))]
            for a in range(AggOp.shape[1])], dtype=np.int64)

    # T interpolates only the first `blocksize` candidates exactly, so the
    # root-node block of T is square and invertible (reference
    # rootnode.py:400); the full candidate set is injected into coarse B.
    T, dummy_Bc = fit_candidates(AggOp, B[:, :max(bs, 1)])
    Cpt_params = get_Cpt_params(A, Cnodes, AggOp, T)
    T = scale_T(T, Cpt_params["P_I"], Cpt_params["I_F"],
                blocksize=max(bs, 1))
    # coarse candidates by injection at the root nodes
    B_coarse = np.asarray(Cpt_params["P_I"].T @ B)

    fn, kwargs = unpack_arg(smooth[i])
    if fn == "energy":
        P = energy_prolongation_smoother(A, T, C, B_coarse, B,
                                         (True, Cpt_params), **kwargs)
    elif fn is None:
        P = to_csr(T)
    else:
        raise ValueError("rootnode_solver requires the 'energy' prolongation "
                         f"smoother (got {fn!r})")

    if symmetry == "hermitian":
        R = P.conjugate().T.tocsr()
    elif symmetry == "symmetric":
        R = P.T.tocsr()
    else:
        AH = A.conjugate().T.tocsr()
        CH = _strength(AH, lvl.BH, strength[i])
        TH, _ = fit_candidates(AggOp, lvl.BH)
        TH = scale_T(TH, Cpt_params["P_I"], Cpt_params["I_F"],
                     blocksize=max(bs, 1))
        BH_coarse = np.asarray(Cpt_params["P_I"].T @ lvl.BH)
        if fn == "energy":
            RH = energy_prolongation_smoother(AH, TH, CH, BH_coarse, lvl.BH,
                                              (True, Cpt_params), **kwargs)
        else:
            RH = to_csr(TH)
        R = RH.conjugate().T.tocsr()
        lvl.BH = lvl.BH

    if keep:
        lvl.C = C
        lvl.AggOp = AggOp
        lvl.T = T
        lvl.Fpts = Cpt_params["Fpts"]
    lvl.Cpts = Cpt_params["Cpts"]
    lvl.P_csr = to_csr(P)
    lvl.R_csr = to_csr(R)
    lvl.symmetry = symmetry
    # embedding positions for the gather-free DIA transfer form: rootnode
    # coarse dofs ARE fine root dofs by injection (P_I maps coarse column
    # -> fine root-dof row), so invert P_I's map when it is one-to-one
    Pi = Cpt_params["P_I"].tocoo()
    nc = lvl.P_csr.shape[1]
    root_dofs = np.full(nc, -1, dtype=np.int64)
    root_dofs[Pi.col] = Pi.row
    if (root_dofs >= 0).all():
        lvl.root_dofs = root_dofs

    from .aggregation import galerkin_product, coarse_bsr_twin

    A_coarse, A_coarse_bsr = galerkin_product(lvl, A, bs,
                                              B_coarse.shape[1], symmetry)

    new = Level()
    new.A_csr = A_coarse
    new.B = B_coarse
    # rootnode keeps the node blocksize CONSTANT across levels: T fits only
    # the first `bs` candidates (square root-node blocks) and the coarse
    # dofs are injected fine root dofs, so each coarse node carries bs dofs
    # regardless of how many candidates B columns hold (the reference's
    # all-BSR pipeline inherits T.blocksize=(bs,bs) everywhere; SA differs —
    # its T fits all K candidates, giving K dofs per coarse node)
    new.blocksize = max(bs, 1)
    new.symmetry = symmetry
    if symmetry == "nonsymmetric":
        new.BH = np.asarray(Cpt_params["P_I"].T @ lvl.BH)
    new.A_bsr = coarse_bsr_twin(A_coarse, A_coarse_bsr, new.blocksize)
    levels.append(new)
