"""Pallas TPU kernel for the masked ELL SpGEMM (pattern-restricted A @ B).

Why: the XLA formulation (spgemm_device.masked_spgemm_ell) is built on
``Bd[a_col]`` row gathers — ~8 ns/element on the TPU scalar unit — so the
numeric Galerkin stage under all device/distributed setup (role of the
reference's ``incomplete_mat_mult_csr``, evolution_strength.h:676, and the
``R*A*P`` products, classical/classical.py:187) runs far below the
machine's compute rate.

This kernel replaces every gather with **one-hot densification + an MXU
contraction**, the same move the DIA halo kernel used to kill the SpMV
gather:

* B's rows are pre-partitioned into fixed chunks of ``Wc`` rows; for each
  chunk the *host* records the sorted unique columns appearing in it
  (``ucols``, ≤ Uc per chunk) — pure symbolic work, reused across repeated
  products on the same pattern (energy iterations, re-RAPs).
* For each tile of ``T`` output rows the host records which B-chunks its
  A-entries touch (an active-chunk list — multi-band matrices skip the
  empty space between bands).
* On device, per (tile, active chunk):
    - ``A_dense[t, j]  = sum_a Ad[t,a]·[Ac[t,a] == lo+j]``   (VPU compare)
    - ``B_dense[j, u]  = sum_b Bd[j,b]·[Bc[j,b] == ucols[u]]`` (VPU compare)
    - ``C = A_dense @ B_dense``                                 (MXU)
    - ``out[t, o] += sum_u C[t, u]·[pat_cols[t,o] == ucols[u]]`` (VPU)
  All transients live in VMEM; B chunks and their column tables are DMA'd
  from HBM with runtime offsets taken from the active-chunk list.

The matmul runs with ``precision=HIGHEST`` so products carry f32-grade
accuracy (bf16-split passes); results agree with the exact-VPU XLA path to
f32 roundoff, not bitwise — callers with bitwise pins keep the XLA path.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .ell import SparseELL
from .pallas_kernels import pallas_available

__all__ = ["MaskedSpgemmPlan", "pallas_spgemm_supported"]

_LANE = 128


def pallas_spgemm_supported() -> bool:
    """Static backend gate (kernel itself is also feasibility-gated)."""
    if not pallas_available():
        return False
    return jax.device_count() == 1


def _round_up(x, m):
    return -(-int(x) // m) * m


def _masked_cols(M: SparseELL) -> np.ndarray:
    """Host column slab with padding slots replaced by -1."""
    cols = np.asarray(M.cols)
    nnz = np.asarray(M.row_nnz)
    valid = np.arange(M.width, dtype=np.int32)[None, :] < nnz[:, None]
    return np.where(valid, cols, -1).astype(np.int32)


def _unique_rows_padded(slab: np.ndarray, pad_val: int):
    """Row-wise sorted uniques of a 2-D int slab, -1 entries dropped.

    Returns (uniq, counts): uniq is (rows, max_count) padded with
    ``pad_val``; vectorized via one sort + run-length compaction."""
    s = np.sort(slab, axis=1)
    fresh = np.empty_like(s, dtype=bool)
    fresh[:, 0] = s[:, 0] >= 0
    fresh[:, 1:] = (s[:, 1:] != s[:, :-1]) & (s[:, 1:] >= 0)
    counts = fresh.sum(axis=1).astype(np.int32)
    kmax = int(counts.max()) if counts.size else 0
    kmax = max(kmax, 1)
    out = np.full((s.shape[0], kmax), pad_val, dtype=np.int32)
    r, c = np.nonzero(fresh)
    pos = np.arange(r.size) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    out[r, pos] = s[r, c]
    return out, counts


class MaskedSpgemmPlan:
    """Host-symbolic plan for ``C = (A @ B) restricted to pattern``.

    Built once per (A-structure, B-structure, pattern) triple; ``__call__``
    then runs the numeric product on device with fresh data slabs — the
    reuse model of the reference's symbolic/numeric csr_matmat split.

    Parameters
    ----------
    A, B, pattern : SparseELL (only structure is read at plan time)
    T : output row tile;  Wc : B row chunk;  caps bound VMEM feasibility.

    Attributes
    ----------
    feasible : False when the structure needs more VMEM than the caps
        allow (very wide unique sets / too many active chunks) — callers
        fall back to the XLA gather formulation.
    """

    def __init__(self, A: SparseELL, B: SparseELL, pattern: SparseELL,
                 T: int = 256, Wc: int = 512,
                 max_Uc: int = 1536, max_nch: int = 48):
        self.T, self.Wc = T, Wc
        self.shape = pattern.shape
        self.w_A, self.w_B, self.w_out = A.width, B.width, pattern.width
        n, nB = A.shape[0], B.shape[0]
        self.n, self.nB = n, nB
        self.n_pad = _round_up(max(n, 1), T)
        self.nB_pad = _round_up(max(nB, 1), Wc)
        self.n_tiles = self.n_pad // T
        n_chunks = self.nB_pad // Wc

        Ac = _masked_cols(A)
        Bc = _masked_cols(B)
        Pc = _masked_cols(pattern)

        # per-chunk sorted unique B columns (host symbolic, reused)
        bc_pad = np.full((self.nB_pad, self.w_B), -1, dtype=np.int32)
        bc_pad[:nB] = Bc
        ucols, ucnt = _unique_rows_padded(
            bc_pad.reshape(n_chunks, Wc * self.w_B), pad_val=-2)
        self.Uc = _round_up(ucols.shape[1], _LANE)
        if self.Uc > max_Uc:
            self.feasible = False
            return
        uc = np.full((n_chunks, self.Uc), -2, dtype=np.int32)
        uc[:, :ucols.shape[1]] = ucols

        # per-tile active chunk lists from A's column slab
        ac_pad = np.full((self.n_pad, self.w_A), -1, dtype=np.int32)
        ac_pad[:n] = Ac
        chunk_of = np.where(ac_pad >= 0, ac_pad // Wc, -1)
        tiles, tcnt = _unique_rows_padded(
            chunk_of.reshape(self.n_tiles, T * self.w_A), pad_val=-1)
        self.nch = tiles.shape[1]
        if self.nch > max_nch:
            self.feasible = False
            return
        self.chunk_ids = jnp.asarray(tiles)                # (n_tiles, nch)
        self.ucols = jnp.asarray(uc)                       # (n_chunks, Uc)
        pc_pad = np.full((self.n_pad, self.w_out), -1, dtype=np.int32)
        pc_pad[:n] = Pc
        self.pat_cols = jnp.asarray(pc_pad)                # (n_pad, w_out)
        self._pattern = pattern
        # VMEM feasibility: A_dense + B_dense + C + chunk slabs (+2x DMA)
        vmem = 4 * (T * Wc + Wc * self.Uc + T * self.Uc
                    + 3 * Wc * self.w_B + 2 * self.Uc
                    + 3 * T * (self.w_A + self.w_out))
        self.feasible = vmem < 12 * 1024 * 1024
        self._fn = None

    def describe(self) -> str:
        if not self.feasible:
            return "infeasible"
        return (f"T={self.T} Wc={self.Wc} Uc={self.Uc} nch={self.nch} "
                f"tiles={self.n_tiles}")

    # -- device execution ---------------------------------------------------
    def __call__(self, A: SparseELL, B: SparseELL) -> SparseELL:
        if not self.feasible:
            raise ValueError("plan is infeasible; use the XLA path")
        out = _spgemm_pallas(
            A.data.astype(jnp.float32), A.cols,
            B.data.astype(jnp.float32), B.cols,
            self.pat_cols, self.chunk_ids, self.ucols,
            T=self.T, Wc=self.Wc, Uc=self.Uc, nch=self.nch,
            w_A=self.w_A, w_B=self.w_B, w_out=self.w_out,
            n_pad=self.n_pad, nB_pad=self.nB_pad,
            interpret=_INTERPRET[0],
        )
        pat = self._pattern
        return SparseELL(data=out[:self.n].astype(A.dtype),
                         cols=pat.cols, row_nnz=pat.row_nnz,
                         shape=pat.shape)


# module-level interpret toggle for CPU correctness tests
_INTERPRET = [False]


@partial(jax.jit, static_argnames=(
    "T", "Wc", "Uc", "nch", "w_A", "w_B", "w_out", "n_pad", "nB_pad",
    "interpret"))
def _spgemm_pallas(Ad, Ac, Bd, Bc, pat_cols, chunk_ids, ucols, *,
                   T, Wc, Uc, nch, w_A, w_B, w_out, n_pad, nB_pad,
                   interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, nB = Ad.shape[0], Bd.shape[0]
    # pad row counts to the tile/chunk grid (data 0 → contributes nothing)
    Ad = jnp.pad(Ad, ((0, n_pad - n), (0, 0)))
    Ac = jnp.pad(Ac, ((0, n_pad - n), (0, 0)))
    Bd = jnp.pad(Bd, ((0, nB_pad - nB), (0, 0)))
    Bc = jnp.pad(Bc, ((0, nB_pad - nB), (0, 0)), constant_values=-1)

    def kernel(ids_ref, ad_ref, ac_ref, pat_ref,
               bd_hbm, bc_hbm, uc_hbm, out_ref,
               bd_s, bc_s, uc_s, acc_ref, sems):
        acc_ref[:] = jnp.zeros((T, w_out), dtype=jnp.float32)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, Wc), 1)

        for k in range(nch):
            cid = ids_ref[0, k]

            @pl.when(cid >= 0)
            def _():
                lo = cid * Wc
                cp_bd = pltpu.make_async_copy(
                    bd_hbm.at[pl.ds(lo, Wc), :], bd_s, sems.at[0])
                cp_bc = pltpu.make_async_copy(
                    bc_hbm.at[pl.ds(lo, Wc), :], bc_s, sems.at[1])
                cp_uc = pltpu.make_async_copy(
                    uc_hbm.at[pl.ds(cid, 1), :], uc_s, sems.at[2])
                cp_bd.start()
                cp_bc.start()
                cp_uc.start()

                # A_dense while DMAs fly: needs only the A tile (VMEM)
                a_dense = jnp.zeros((T, Wc), dtype=jnp.float32)
                for a in range(w_A):
                    loc = ac_ref[:, a:a + 1] - lo            # (T, 1)
                    a_dense = a_dense + jnp.where(
                        loc == iota_w, ad_ref[:, a:a + 1], 0.0)

                cp_bd.wait()
                cp_bc.wait()
                cp_uc.wait()

                u = uc_s[0:1, :]                             # (1, Uc)
                b_dense = jnp.zeros((Wc, Uc), dtype=jnp.float32)
                for b in range(w_B):
                    b_dense = b_dense + jnp.where(
                        bc_s[:, b:b + 1] == u, bd_s[:, b:b + 1], 0.0)

                c = jax.lax.dot_general(
                    a_dense, b_dense,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

                for o in range(w_out):
                    hit = pat_ref[:, o:o + 1] == u           # (T, Uc)
                    acc_ref[:, o:o + 1] = acc_ref[:, o:o + 1] + jnp.sum(
                        jnp.where(hit, c, 0.0), axis=1, keepdims=True)

        out_ref[:] = acc_ref[:]

    grid = (n_pad // T,)
    with jax.enable_x64(False):   # Mosaic needs i32 index plumbing
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, nch), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((T, w_A), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, w_A), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, w_out), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),   # Bd (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),   # Bc (HBM)
                pl.BlockSpec(memory_space=pltpu.ANY),   # ucols (HBM)
            ],
            out_specs=pl.BlockSpec((T, w_out), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, w_out), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((Wc, w_B), jnp.float32),
                pltpu.VMEM((Wc, w_B), jnp.int32),
                pltpu.VMEM((1, Uc), jnp.int32),
                pltpu.VMEM((T, w_out), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            interpret=interpret,
        )(chunk_ids, Ad, Ac, pat_cols, Bd, Bc, ucols)
    return out
