"""Composable structured linear operators for the device solve phase.

Grid-block aggregation keeps every level of the hierarchy grid-structured, so
the transfer operators P and R never need gathers either:

* tentative prolongation  T  = per-aggregate broadcast  → ``GridRepeatOp``
  (reshape + repeat + crop + weight: pure vector ops)
* tentative restriction  T^T = per-aggregate reduction  → ``GridPoolOp``
* smoothed P = (I - omega D^{-1} A) T                    → ``ComposedOp`` of a
  :class:`SparseDIA` smoothing factor with the grid op.

Everything is a pytree exposing ``matvec``/``shape`` — the compiled cycle in
multilevel.py is agnostic to the operator representation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ComposedOp", "GridRepeatOp", "GridPoolOp", "DenseOp"]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ComposedOp:
    """matvec = ops[0] @ (ops[1] @ (... @ x)) — right-to-left application."""

    ops: Tuple                    # pytree children
    shape: Tuple[int, int]

    def tree_flatten(self):
        return (self.ops,), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (ops,) = children
        (shape,) = aux
        return cls(ops=ops, shape=shape)

    @property
    def dtype(self):
        return self.ops[0].dtype

    def matvec(self, x):
        for op in reversed(self.ops):
            x = op.matvec(x)
        return x

    def astype(self, dtype):
        return ComposedOp(ops=tuple(op.astype(dtype) for op in self.ops),
                          shape=self.shape)

    def __matmul__(self, x):
        return self.matvec(jnp.asarray(x))

    def to_scipy(self):
        import scipy.sparse as sp
        import functools

        mats = [op.to_scipy() for op in self.ops]
        return functools.reduce(lambda a, b: (a @ b).tocsr(), mats)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class GridRepeatOp:
    """Tentative prolongation on a d-dim grid with block aggregation.

    ``matvec(xc)``: reshape xc to the coarse grid, ``jnp.repeat`` each axis by
    the block size, crop to the fine grid, flatten, scale by the per-fine-node
    weight map (the normalized near-nullspace values — what fit_candidates'
    per-aggregate QR produces for K = 1;
    ≙ amg_core fit_candidates smoothed_aggregation.h:323).
    """

    wmap: jnp.ndarray             # (n_fine,)
    fine_grid: Tuple[int, ...]    # static
    block: Tuple[int, ...]        # static
    shape: Tuple[int, int]

    def tree_flatten(self):
        return (self.wmap,), (self.fine_grid, self.block, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (wmap,) = children
        fine_grid, block, shape = aux
        return cls(wmap=wmap, fine_grid=fine_grid, block=block, shape=shape)

    @property
    def dtype(self):
        return self.wmap.dtype

    @property
    def coarse_grid(self):
        return tuple(-(-g // b) for g, b in zip(self.fine_grid, self.block))

    def astype(self, dtype):
        return GridRepeatOp(wmap=self.wmap.astype(dtype),
                            fine_grid=self.fine_grid, block=self.block,
                            shape=self.shape)

    def matvec(self, xc):
        cg = self.coarse_grid
        y = xc.reshape(cg)
        for ax, b in enumerate(self.block):
            if b > 1:
                y = jnp.repeat(y, b, axis=ax)
        # crop to the fine grid (last blocks may be partial)
        sl = tuple(slice(0, g) for g in self.fine_grid)
        y = y[sl].reshape(-1)
        return self.wmap * y

    def __matmul__(self, x):
        return self.matvec(jnp.asarray(x))

    def to_scipy(self):
        import scipy.sparse as sp

        n_f, n_c = self.shape
        cg = self.coarse_grid
        coords = np.unravel_index(np.arange(n_f), self.fine_grid)
        cidx = np.ravel_multi_index(
            tuple(c // b for c, b in zip(coords, self.block)), cg)
        return sp.coo_matrix(
            (np.asarray(self.wmap), (np.arange(n_f), cidx)),
            shape=self.shape).tocsr()


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class GridPoolOp:
    """Tentative restriction T^T: weight then sum-pool over each block."""

    wmap: jnp.ndarray             # (n_fine,)
    fine_grid: Tuple[int, ...]
    block: Tuple[int, ...]
    shape: Tuple[int, int]        # (n_coarse, n_fine)

    def tree_flatten(self):
        return (self.wmap,), (self.fine_grid, self.block, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (wmap,) = children
        fine_grid, block, shape = aux
        return cls(wmap=wmap, fine_grid=fine_grid, block=block, shape=shape)

    @property
    def dtype(self):
        return self.wmap.dtype

    @property
    def coarse_grid(self):
        return tuple(-(-g // b) for g, b in zip(self.fine_grid, self.block))

    def astype(self, dtype):
        return GridPoolOp(wmap=self.wmap.astype(dtype),
                          fine_grid=self.fine_grid, block=self.block,
                          shape=self.shape)

    def matvec(self, xf):
        w = (jnp.conj(self.wmap) * xf).reshape(self.fine_grid)
        cg = self.coarse_grid
        # pad each axis to a block multiple, then reshape-sum per axis
        pads = tuple((0, cg[d] * self.block[d] - self.fine_grid[d])
                     for d in range(len(cg)))
        w = jnp.pad(w, pads)
        for ax, b in enumerate(self.block):
            if b > 1:
                shp = w.shape[:ax] + (cg[ax], b) + w.shape[ax + 1:]
                w = w.reshape(shp).sum(axis=ax + 1)
        return w.reshape(-1)

    def __matmul__(self, x):
        return self.matvec(jnp.asarray(x))

    def to_scipy(self):
        return GridRepeatOp(self.wmap, self.fine_grid, self.block,
                            (self.shape[1], self.shape[0])) \
            .to_scipy().T.tocsr()


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DenseOp:
    """Small dense operator (coarse transfers / coarse A) — MXU matmul."""

    mat: jnp.ndarray
    shape: Tuple[int, int]

    def tree_flatten(self):
        return (self.mat,), (self.shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (mat,) = children
        (shape,) = aux
        return cls(mat=mat, shape=shape)

    @property
    def dtype(self):
        return self.mat.dtype

    def astype(self, dtype):
        return DenseOp(mat=self.mat.astype(dtype), shape=self.shape)

    def matvec(self, x):
        return self.mat @ x

    def __matmul__(self, x):
        return self.mat @ jnp.asarray(x)

    def diagonal(self):
        return jnp.diagonal(self.mat)

    def to_scipy(self):
        import scipy.sparse as sp

        return sp.csr_matrix(np.asarray(self.mat))
