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
  (``ucols``, ≤ Uc per chunk) and each B entry's **local index** within
  that table (``bloc``) — pure symbolic work, reused across repeated
  products on the same pattern (energy iterations, re-RAPs).
* The grid is the flat list of (output row tile, active B chunk) PAIRS,
  sorted by tile — tiles whose A-entries touch 3 chunks get 3 grid steps,
  tiles that touch 13 get 13; no padding to the worst tile.  The pair
  table rides scalar prefetch (SMEM) and drives the block index maps, so
  Pallas double-buffers the B-chunk loads automatically.
* Per (tile t, chunk q) grid step, with ``lo = q*Wc``:
    - ``A_dense[t, j]  = sum_a Ad[t,a]·[Ac[t,a] - lo == j]``   (VPU compare)
    - ``B_dT[u, j]     = sum_b Bd[b,j]·[bloc[b,j] == u]``      (VPU compare)
    - ``C = A_dense @ B_dT^T``                                 (MXU)
    - ``out[t, o] += sum_u C[t, u]·[pat_cols[t,o] == ucols[u]]`` (VPU)
  The output block stays resident in VMEM across the consecutive grid
  steps of one tile (same out index) and flushes once per tile.

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
_SUB = 8


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
    """Row-wise sorted uniques of a 2-D int slab, negative entries dropped.

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
    T : output row tile;  Wc : B row chunk (multiple of 128); caps bound
        VMEM/SMEM feasibility.

    Attributes
    ----------
    feasible : False when the structure needs more VMEM/SMEM than the caps
        allow (very wide unique sets / too many tile-chunk pairs) — callers
        fall back to the XLA gather formulation.
    """

    def __init__(self, A: SparseELL, B: SparseELL, pattern: SparseELL,
                 T: int = 256, Wc: int = 512,
                 max_Uc: int = 2048, max_pairs: int = 96 * 1024):
        self.T, self.Wc = T, Wc
        self.shape = pattern.shape
        self.w_A, self.w_B, self.w_out = A.width, B.width, pattern.width
        self.w_B8 = _round_up(self.w_B, _SUB)
        n, nB = A.shape[0], B.shape[0]
        self.n, self.nB = n, nB
        self.n_pad = _round_up(max(n, 1), T)
        self.nB_pad = _round_up(max(nB, 1), Wc)
        self.n_tiles = self.n_pad // T
        n_chunks = self.nB_pad // Wc
        self.n_chunks = n_chunks
        self.feasible = False

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
            return
        uc = np.full((n_chunks, _SUB, self.Uc), -2, dtype=np.int32)
        uc[:, 0, :ucols.shape[1]] = ucols

        # local index of every B entry inside its chunk's ucols table
        # (vectorized: one flat searchsorted over offset-disambiguated keys)
        BIG = np.int64(1) << 32
        uc_sorted = np.where(ucols < 0, np.int64(BIG - 1),
                             ucols.astype(np.int64))
        uc_keys = (uc_sorted
                   + BIG * np.arange(n_chunks, dtype=np.int64)[:, None])
        val_keys = (bc_pad.astype(np.int64).reshape(n_chunks, -1)
                    + BIG * np.arange(n_chunks, dtype=np.int64)[:, None])
        pos = np.searchsorted(uc_keys.ravel(), val_keys.ravel())
        loc = (pos - (np.arange(n_chunks).repeat(Wc * self.w_B)
                      * ucols.shape[1])).astype(np.int32)
        loc = loc.reshape(self.nB_pad, self.w_B)
        loc[bc_pad < 0] = -1
        # chunk-major transposed layout: (n_chunks, w_B8, Wc)
        bl = np.full((self.nB_pad, self.w_B8), -1, dtype=np.int32)
        bl[:, :self.w_B] = loc
        self.bloc = jnp.asarray(
            bl.reshape(n_chunks, Wc, self.w_B8).transpose(0, 2, 1))
        self.ucols = jnp.asarray(uc)                       # (nch, 8, Uc)

        # flat (tile, chunk) pair list from A's column slab, sorted by tile
        ac_pad = np.full((self.n_pad, self.w_A), -1, dtype=np.int32)
        ac_pad[:n] = Ac
        chunk_of = np.where(ac_pad >= 0, ac_pad // Wc, -1)
        tiles, tcnt = _unique_rows_padded(
            chunk_of.reshape(self.n_tiles, T * self.w_A), pad_val=-1)
        # every tile contributes ≥1 pair so its output block is written
        # (empty tiles pair with chunk 0; their A slab is all-padding so
        # the contribution is exactly zero)
        tr, tc = np.nonzero(tiles >= 0)
        empty = np.setdiff1d(np.arange(self.n_tiles), tr,
                             assume_unique=False)
        tile_of = np.concatenate([tr, empty]).astype(np.int32)
        chunk_id = np.concatenate(
            [tiles[tr, tc], np.zeros(empty.size, dtype=np.int32)]
        ).astype(np.int32)
        order = np.argsort(tile_of, kind="stable")
        tile_of, chunk_id = tile_of[order], chunk_id[order]
        self.n_pairs = int(tile_of.size)
        if self.n_pairs > max_pairs:          # SMEM table guard (~0.75 MB)
            return
        # two flat 1-D tables: SMEM pads the MINOR dim of prefetched
        # operands to 128 lanes, so an (n_pairs, 2) table would cost 64×
        # its logical size (measured: 7.3 MB for 14k pairs)
        self.tile_of = jnp.asarray(tile_of)              # (n_pairs,)
        self.chunk_id = jnp.asarray(chunk_id)            # (n_pairs,)
        self.avg_nch = self.n_pairs / max(self.n_tiles, 1)

        pc_pad = np.full((self.n_pad, self.w_out), -1, dtype=np.int32)
        pc_pad[:n] = Pc
        self.pat_cols = jnp.asarray(pc_pad)                # (n_pad, w_out)
        self._pattern = pattern
        # VMEM bound: blocks (double-buffered) + transients
        vmem = 4 * (2 * (2 * T * self.w_A + T * self.w_out
                         + 2 * self.w_B8 * Wc + _SUB * self.Uc
                         + T * self.w_out)
                    + T * Wc + 2 * self.Uc * Wc + T * self.Uc)
        self.feasible = vmem < 12 * 1024 * 1024

    def describe(self) -> str:
        if not self.feasible:
            return "infeasible"
        return (f"T={self.T} Wc={self.Wc} Uc={self.Uc} "
                f"pairs={self.n_pairs} tiles={self.n_tiles} "
                f"avg_nch={self.avg_nch:.1f}")

    # -- device execution ---------------------------------------------------
    def __call__(self, A: SparseELL, B: SparseELL) -> SparseELL:
        if not self.feasible:
            raise ValueError("plan is infeasible; use the XLA path")
        out = _spgemm_pallas(
            A.data.astype(jnp.float32), A.cols,
            B.data.astype(jnp.float32),
            self.pat_cols, self.tile_of, self.chunk_id,
            self.bloc, self.ucols,
            T=self.T, Wc=self.Wc, Uc=self.Uc, n_pairs=self.n_pairs,
            w_A=self.w_A, w_B=self.w_B, w_B8=self.w_B8, w_out=self.w_out,
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
    "T", "Wc", "Uc", "n_pairs", "w_A", "w_B", "w_B8", "w_out", "n_pad",
    "nB_pad", "interpret"))
def _spgemm_pallas(Ad, Ac, Bd, pat_cols, tile_of, chunk_id, bloc, ucols, *,
                   T, Wc, Uc, n_pairs, w_A, w_B, w_B8, w_out, n_pad,
                   nB_pad, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, nB = Ad.shape[0], Bd.shape[0]
    # pad row counts to the tile/chunk grid (data 0 → contributes nothing)
    Ad = jnp.pad(Ad, ((0, n_pad - n), (0, 0)))
    Ac = jnp.pad(Ac, ((0, n_pad - n), (0, 0)))
    # chunk-major transposed values: (n_chunks, w_B8, Wc)
    Bd = jnp.pad(Bd, ((0, nB_pad - nB), (0, w_B8 - w_B)))
    Bd = Bd.reshape(nB_pad // Wc, Wc, w_B8).transpose(0, 2, 1)

    def kernel(tof_ref, cid_ref, ad_ref, ac_ref, pat_ref,
               bd_ref, bl_ref, uc_ref, out_ref):
        p = pl.program_id(0)
        tile = tof_ref[p]
        cid = cid_ref[p]
        prev = tof_ref[jnp.maximum(p - 1, 0)]
        start = jnp.logical_or(p == 0, tile != prev)

        @pl.when(start)
        def _():
            out_ref[:] = jnp.zeros((T, w_out), dtype=jnp.float32)

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (T, Wc), 1)
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (Uc, Wc), 0)

        # A tile densified onto this chunk's local window (VPU)
        lo = cid * Wc
        a_dense = jnp.zeros((T, Wc), dtype=jnp.float32)
        for a in range(w_A):
            loc = ac_ref[:, a:a + 1] - lo                 # (T, 1)
            a_dense = a_dense + jnp.where(
                loc == iota_w, ad_ref[:, a:a + 1], 0.0)

        # B chunk densified transposed: (Uc, Wc)
        b_dt = jnp.zeros((Uc, Wc), dtype=jnp.float32)
        for b in range(w_B):
            b_dt = b_dt + jnp.where(
                bl_ref[0, b:b + 1, :] == iota_u, bd_ref[0, b:b + 1, :], 0.0)

        # bf16x3 contraction: Mosaic's dot lowers to 1-pass bf16 (DEFAULT,
        # ~5e-3 rel err — too lossy for Galerkin products) or 6-pass fp32
        # (HIGHEST, 2x the need); an explicit hi/lo split gives ~f32
        # accuracy in 3 passes (the lo·lo term is below f32 roundoff)
        def _dot(x, y):
            return jax.lax.dot_general(
                x, y, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        ah = a_dense.astype(jnp.bfloat16)
        al = (a_dense - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b_dt.astype(jnp.bfloat16)
        bl = (b_dt - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        c = _dot(ah, bh) + (_dot(ah, bl) + _dot(al, bh))  # (T, Uc)

        u = uc_ref[0, 0:1, :]                             # (1, Uc)
        for o in range(w_out):
            hit = pat_ref[:, o:o + 1] == u                # (T, Uc)
            out_ref[:, o:o + 1] = out_ref[:, o:o + 1] + jnp.sum(
                jnp.where(hit, c, 0.0), axis=1, keepdims=True)

    grid = (n_pairs,)
    with jax.enable_x64(False):   # Mosaic needs i32 index plumbing
        # pair table rides scalar prefetch (SMEM-resident before the body
        # runs) and drives every block index map — per-tile SMEM blocks
        # fail Mosaic's (8, 128) block-tiling check, measured on v5e
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((T, w_A), lambda p, tof, cid: (tof[p], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, w_A), lambda p, tof, cid: (tof[p], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T, w_out), lambda p, tof, cid: (tof[p], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w_B8, Wc),
                             lambda p, tof, cid: (cid[p], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w_B8, Wc),
                             lambda p, tof, cid: (cid[p], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _SUB, Uc),
                             lambda p, tof, cid: (cid[p], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, w_out),
                                   lambda p, tof, cid: (tof[p], 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_pad, w_out), jnp.float32),
            interpret=interpret,
        )(tile_of, chunk_id, Ad, Ac, pat_cols, Bd, bloc, ucols)
    return out
