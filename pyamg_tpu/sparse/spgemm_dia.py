"""Pallas TPU kernel: masked SpGEMM with a BANDED left operand.

The general one-hot kernel (spgemm_pallas.py) pays ``T·Wc·Uc`` MXU MACs per
tile-chunk pair — ~2600× the useful flops for a 5-diagonal A.  But in the
setup-phase product chains, the LEFT operand is usually square and banded:
``A @ P`` (fine operator × prolongator), ``S @ S`` (strength powers),
``S @ T`` (smoother × tentative) all have few distinct ``col - row``
offsets.  For those this kernel computes

    C[i, o] = Σ_δ  A[i, i+δ] · Σ_b Bd[i+δ, b] · [Bc[i+δ, b] == pat[i, o]]

with every ``δ`` a *static* shifted slice of B's transposed row slabs — the
exact move the DIA halo SpMV kernel (pallas_kernels.py) used: lane-
misaligned static slices of a halo'd VMEM window, which Mosaic lowers to
cheap lane rotates.  No gathers, no densification, no MXU; the arithmetic
is ~``k·w_B·w_out`` VPU ops per row (hundreds, not hundreds of thousands),
so the product runs at HBM speed.

The A values per offset are re-derived in-kernel from A's ELL slabs by a
compare (``Ac - row == δ``), so no host-side DIA conversion of the numeric
data is needed — the plan is pure structure, reusable across repeated
products on the same pattern (role of the reference's symbolic/numeric
csr_matmat split; evolution_strength.h:676, classical/classical.py:187).

Exactness: every contribution is an f32 multiply-add on the VPU (no bf16
splits), so results match the XLA gather path to f32 reassociation only.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .ell import SparseELL
from .pallas_kernels import pallas_available

__all__ = ["BandedSpgemmPlan"]

_LANE = 128
_SUB = 8


def _round_up(x, m):
    return -(-int(x) // m) * m


class BandedSpgemmPlan:
    """Host-symbolic plan for ``C = (A @ B) restricted to pattern`` where
    A is square-ish and banded (few distinct ``col - row`` offsets).

    ``feasible`` is False when A has more than ``max_k`` distinct offsets,
    the band is too wide for a VMEM halo window, or widths exceed the
    sublane budget — callers fall back to the one-hot / XLA paths.
    """

    def __init__(self, A: SparseELL, B: SparseELL, pattern: SparseELL,
                 max_k: int = 64, max_halo: int = 32768):
        self.feasible = False
        self.shape = pattern.shape
        self.w_A, self.w_B, self.w_out = A.width, B.width, pattern.width
        n, nB = A.shape[0], B.shape[0]
        self.n, self.nB = n, nB
        if self.w_A > 32 or self.w_B > 32 or self.w_out > 64:
            return

        cols = np.asarray(A.cols)
        nnz = np.asarray(A.row_nnz)
        valid = np.arange(A.width, dtype=np.int32)[None, :] < nnz[:, None]
        delta = cols - np.arange(n, dtype=cols.dtype)[:, None]
        if n > 16384:
            # cheap pre-probe: a 4k-row sample of an irregular matrix
            # already exceeds max_k, skipping the full O(nnz) unique
            sel = np.linspace(0, n - 1, 4096).astype(np.int64)
            if np.unique(delta[sel][valid[sel]]).size > max_k:
                return
        offs = np.unique(delta[valid])
        if offs.size == 0:
            offs = np.zeros(1, dtype=np.int64)
        if offs.size > max_k:
            return
        maxd = int(np.abs(offs).max())
        H = 512
        while H < maxd:
            H *= 2
        if H > max_halo:
            return
        self.offsets = tuple(int(o) for o in offs)
        self.H = H

        # tile size: keep double-buffered blocks + the concat window under
        # ~10 MiB of VMEM
        w_A8 = _round_up(self.w_A, _SUB)
        w_B8 = _round_up(self.w_B, _SUB)
        w_o8 = _round_up(self.w_out, _SUB)
        per_row = 4 * (2 * (2 * w_A8 + 2 * w_B8 + 2 * w_o8)  # dbl-buffered
                       + 4 * w_B8 + w_o8 + w_A8)   # windows+slices+acc+val
        T = max(512, H)
        while (2 * T <= 16384
               and (2 * T + 2 * H) * per_row < 5 * 1024 * 1024):
            T *= 2
        if (T + 2 * H) * per_row >= 8 * 1024 * 1024:
            return
        self.T = T
        self.n_pad = _round_up(max(n, 1), T)
        # B slabs cover every reachable row index (cols can exceed n_pad
        # by up to maxd when A is wide)
        self.L = max(self.n_pad, _round_up(nB, H))
        self._pattern = pattern
        self._pat_cols = jnp.asarray(self._sent_T(pattern, w_o8, self.n_pad))
        self.feasible = True

    @staticmethod
    def _sent_T(M: SparseELL, w8: int, L: int) -> np.ndarray:
        """Transposed (w8, L) column slab with -1 sentinels in padding."""
        cols = np.asarray(M.cols)
        nnz = np.asarray(M.row_nnz)
        valid = np.arange(M.width, dtype=np.int32)[None, :] < nnz[:, None]
        s = np.where(valid, cols, -1).astype(np.int32)
        out = np.full((w8, L), -1, dtype=np.int32)
        out[:M.width, :min(M.shape[0], L)] = s[:min(M.shape[0], L)].T
        return out

    def describe(self) -> str:
        if not self.feasible:
            return "infeasible"
        return (f"k={len(self.offsets)} H={self.H} T={self.T} "
                f"tiles={self.n_pad // self.T}")

    def __call__(self, A: SparseELL, B: SparseELL) -> SparseELL:
        if not self.feasible:
            raise ValueError("plan is infeasible; use the one-hot/XLA path")
        out = _banded_spgemm(
            A.data.astype(jnp.float32), A.cols,
            B.data.astype(jnp.float32), B.cols,
            self._pat_cols,
            offsets=self.offsets, T=self.T, H=self.H,
            w_A=self.w_A, w_B=self.w_B, w_out=self.w_out,
            n_pad=self.n_pad, nB=self.nB, L=self.L,
            interpret=_INTERPRET[0],
        )
        pat = self._pattern
        return SparseELL(data=out[:, :self.n].T.astype(A.dtype)
                         [:, :self.w_out],
                         cols=pat.cols, row_nnz=pat.row_nnz,
                         shape=pat.shape)


_INTERPRET = [False]


@partial(jax.jit, static_argnames=(
    "offsets", "T", "H", "w_A", "w_B", "w_out", "n_pad", "nB", "L",
    "interpret"))
def _banded_spgemm(Ad, Ac, Bd, Bc, patT, *,
                   offsets, T, H, w_A, w_B, w_out, n_pad, nB, L, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    w_A8 = _round_up(w_A, _SUB)
    w_B8 = _round_up(w_B, _SUB)
    w_o8 = _round_up(w_out, _SUB)
    n = Ad.shape[0]

    # transposed slabs: (w, rows) with rows on the lane axis
    adT = jnp.zeros((w_A8, n_pad), jnp.float32).at[:w_A, :n].set(Ad.T)
    # A's padding slots carry data 0, so a padding col aliasing a real
    # offset (-1 - row == δ for one row) contributes exactly 0 — A's cols
    # pass through unmasked
    acT = jnp.full((w_A8, n_pad), -1, jnp.int32).at[:w_A, :n].set(Ac.T)
    nBc = min(nB, L)
    bdT = jnp.zeros((w_B8, L), jnp.float32).at[:w_B, :nBc].set(
        Bd[:nBc].T)
    # B's padding cols -1 could false-match a pattern sentinel -1, but the
    # padded DATA is 0 so the contribution vanishes
    bcT = jnp.full((w_B8, L), -1, jnp.int32).at[:w_B, :nBc].set(
        Bc[:nBc].T)
    bdT_h = jnp.pad(bdT, ((0, 0), (H, H)))
    bcT_h = jnp.pad(bcT, ((0, 0), (H, H)), constant_values=-1)

    hpb = T // H

    def kernel(bdh_t, bdc, bdh_b, bch_t, bcc, bch_b,
               ad_ref, ac_ref, pat_ref, out_ref):
        i = pl.program_id(0)
        wd = jnp.concatenate([bdh_t[:], bdc[:], bdh_b[:]], axis=1)
        wc = jnp.concatenate([bch_t[:], bcc[:], bch_b[:]], axis=1)
        row = (i * T
               + jax.lax.broadcasted_iota(jnp.int32, (1, T), 1))  # (1, T)
        acc = jnp.zeros((w_o8, T), dtype=jnp.float32)
        pat = pat_ref[:]
        for delta in offsets:
            # A's value on diagonal δ, re-derived from the ELL slabs
            val = jnp.zeros((1, T), dtype=jnp.float32)
            for a in range(w_A):
                val = val + jnp.where(
                    ac_ref[a:a + 1, :] - row == delta,
                    ad_ref[a:a + 1, :], 0.0)
            wd_d = jax.lax.slice_in_dim(wd, H + delta, H + delta + T,
                                        axis=1)             # (w_B8, T)
            wc_d = jax.lax.slice_in_dim(wc, H + delta, H + delta + T,
                                        axis=1)
            for b in range(w_B):
                av = val * wd_d[b:b + 1, :]                     # (1, T)
                acc = acc + jnp.where(pat == wc_d[b:b + 1, :], av, 0.0)
        out_ref[:] = acc

    grid = (n_pad // T,)
    with jax.enable_x64(False):   # Mosaic needs i32 index plumbing
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((w_B8, H), lambda i: (0, i * hpb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_B8, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_B8, H), lambda i: (0, (i + 1) * hpb + 1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_B8, H), lambda i: (0, i * hpb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_B8, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_B8, H), lambda i: (0, (i + 1) * hpb + 1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_A8, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_A8, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w_o8, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((w_o8, T), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((w_o8, n_pad), jnp.float32),
            interpret=interpret,
        )(bdT_h, bdT, bdT_h, bcT_h, bcT, bcT_h, adT, acT, patT)
    return out
