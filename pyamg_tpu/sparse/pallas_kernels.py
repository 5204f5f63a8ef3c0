"""Pallas TPU kernels for the DIA SpMV hot path.

The XLA formulation of the DIA matvec (dia.py) materializes a padded copy of
x and k shifted element-wise products; on v5e it sustains only ~10% of HBM
bandwidth because every shifted 1-D slice is lane-misaligned against the
(8, 128) vector-register tiling.

This kernel reformulates the stencil in the native 2-D layout: x is viewed
as (rows, 128) so a diagonal offset ``o`` decomposes as ``o = q*128 + s``
with

* the row part ``q``  -> a cheap sublane slice of a halo'd VMEM window, and
* the lane part ``s`` -> one/two lane rotations (``pltpu.roll``) stitched
  with an iota select,

all fused into a single pass over the operands: every HBM byte of the
diagonals is read once, x is read ~(1 + 2H/B) times, the output written
once.  Pallas double-buffers the per-step block DMAs automatically.

Role: the CSR SpMV under the reference's solve loop (multilevel.py:473-548).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["dia_matvec_pallas", "dia_matvec_pallas_v1",
           "dia_matvec_pallas_v2", "pallas_available",
           "pallas_dia_supported"]

_LANES = 128
_HALO = 32             # rows of (·,128) halo on each side of a block (v2)
_MAX_BROWS = 1024      # cap: 1024*128*4B = 512 KiB per f32 block (v2)
_TILE = 65536          # elements per grid step (1-D kernels)


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _plan(offsets, k, dtype):
    """Static block plan for a given offset set: (BROWS, H) or None."""
    qmax = 0
    for off in offsets:
        q, s = divmod(int(off), _LANES)
        qmax = max(qmax, abs(q) + (1 if s else 0))
    H = _HALO
    while qmax >= H:
        H *= 2
    itemsize = jnp.dtype(dtype).itemsize
    # keep (k + 2) double-buffered blocks comfortably inside ~16 MiB VMEM
    budget_rows = (6 * 1024 * 1024) // ((k + 2) * _LANES * itemsize)
    brows = min(_MAX_BROWS, (budget_rows // H) * H)
    if brows < H:
        return None
    return brows, H


def _plan1d(offsets, dtype):
    """Static tile plan for the production halo kernel: (T, H) or None.

    The per-step VMEM block is dominated by the (k, T) diagonal slab;
    Pallas double-buffers it, so T shrinks with the offset count k to keep
    2*(k+3)*T*itemsize inside the ~16 MiB scoped-VMEM limit (wide embedded
    transfer operators reach k ~ 50-100)."""
    k = len(offsets)
    itemsize = jnp.dtype(dtype).itemsize
    maxo = max(abs(int(o)) for o in offsets)
    H = 4096
    while H <= maxo:
        H *= 2
    budget = (6 * 1024 * 1024) // ((k + 3) * itemsize)
    T = _TILE
    while T > budget and T > H:
        T //= 2
    if T < H or T > budget:
        return None
    return T, H


def pallas_dia_supported(offsets, shape, dtype) -> bool:
    """Static gate used by SparseDIA.matvec."""
    if not pallas_available():
        return False
    if jax.device_count() != 1:
        return False            # sharded paths use the XLA formulation
    n, m = shape
    if n != m:
        return False
    if n < 65536:
        return False            # small levels: block padding outweighs gains
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        # bf16 is NOT supported: the halo kernel's lane-misaligned 1-D
        # slices fail Mosaic compilation for 16-bit types ("Invalid input
        # layout", measured on v5e) — a bf16 hierarchy falls back to the
        # XLA formulation instead of crashing at dispatch time
        return False
    return _plan1d(offsets, dtype) is not None


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_matvec_pallas_v2(diags, offsets, x, interpret=False):
    """y[i] = sum_k diags[k, i] * x[i + offsets[k]] via a fused 2-D kernel.

    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend) for correctness testing.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    k = len(offsets)
    plan = _plan(offsets, k, x.dtype)
    brows, H = plan
    blk = brows * _LANES

    n_pad = -(-n // blk) * blk
    R = n_pad // _LANES

    x2 = jnp.zeros((R, _LANES), dtype=x.dtype)
    x2 = jax.lax.dynamic_update_slice(
        x2.reshape(-1), x, (0,)).reshape(R, _LANES)
    xh = jnp.pad(x2, ((H, H), (0, 0)))            # halo'd copy
    d3 = jnp.zeros((k, R, _LANES), dtype=diags.dtype)
    d3 = jax.lax.dynamic_update_slice(
        d3.reshape(k, -1), diags, (0, 0)).reshape(k, R, _LANES)

    hpb = brows // H                               # halo blocks per center

    def kernel(ht_ref, xc_ref, hb_ref, d_ref, o_ref):
        w = jnp.concatenate([ht_ref[:], xc_ref[:], hb_ref[:]], axis=0)
        acc = jnp.zeros((brows, _LANES), dtype=o_ref.dtype)
        lane = jax.lax.broadcasted_iota(jnp.int32, (brows, _LANES), 1)
        for kk, off in enumerate(offsets):
            q, s = divmod(int(off), _LANES)
            a = jax.lax.slice_in_dim(w, H + q, H + q + brows, axis=0)
            if s == 0:
                shifted = a
            else:
                b = jax.lax.slice_in_dim(w, H + q + 1, H + q + 1 + brows,
                                         axis=0)
                roll = (jnp.roll if interpret
                        else partial(pltpu.roll))     # interpreter fallback
                ra = roll(a, shift=_LANES - s, axis=1)
                rb = roll(b, shift=_LANES - s, axis=1)
                shifted = jnp.where(lane < _LANES - s, ra, rb)
            acc = acc + d_ref[kk] * shifted
        o_ref[:] = acc

    with jax.enable_x64(False):     # see dia_matvec_pallas: Mosaic needs i32
        out = pl.pallas_call(
            kernel,
            grid=(R // brows,),
            in_specs=[
                pl.BlockSpec((H, _LANES), lambda i: (i * hpb, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((brows, _LANES), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, _LANES), lambda i: ((i + 1) * hpb + 1, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, brows, _LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((brows, _LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, _LANES), x.dtype),
            interpret=interpret,
        )(xh, x2, xh, d3)
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("offsets", "interpret"))
def dia_matvec_pallas(diags, offsets, x, interpret=False):
    """1-D formulation with halo blocks: the kernel slices a
    (H | T | H)-element VMEM window with plain (lane-misaligned) static
    slices — Mosaic lowers these to cheap lane rotates — while x is read
    only ~(1 + 2H/T) times instead of 3 times."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    k = len(offsets)
    plan = _plan1d(offsets, x.dtype)
    if plan is None:
        raise ValueError(f"no VMEM-feasible tile plan for {k} offsets up to "
                         f"{max(abs(int(o)) for o in offsets)}")
    T, H = plan
    hpb = T // H

    n_pad = -(-n // T) * T
    grid = n_pad // T

    xc = jnp.zeros((n_pad,), dtype=x.dtype)
    xc = jax.lax.dynamic_update_slice(xc, x, (0,))
    xh = jnp.pad(xc, (H, H))
    dpad = jnp.zeros((k, n_pad), dtype=diags.dtype)
    dpad = jax.lax.dynamic_update_slice(dpad, diags, (0, 0))

    def kernel(ht_ref, xc_ref, hb_ref, d_ref, o_ref):
        w = jnp.concatenate([ht_ref[:], xc_ref[:], hb_ref[:]])
        acc = jnp.zeros((T,), dtype=o_ref.dtype)
        for kk, off in enumerate(offsets):
            acc = acc + d_ref[kk, :] * w[H + off:H + off + T]
        o_ref[:] = acc

    # scoped x64-off: under global jax_enable_x64 the Pallas index plumbing
    # traces as int64, which Mosaic cannot legalize ("func.return") — the
    # scope keeps the kernel's index types i32 while the surrounding
    # program's float64 ops (traced outside) are untouched
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((H,), lambda i: (i * hpb,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((T,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H,), lambda i: ((i + 1) * hpb + 1,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, T), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad,), x.dtype),
            interpret=interpret,
        )(xh, xc, xh, dpad)
    return out[:n]


# ---------------------------------------------------------------------------
# v1 (round 1): 1-D blocks with shifted index maps — kept for benchmarking
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("offsets",))
def dia_matvec_pallas_v1(diags, offsets, x):
    """Round-1 kernel: 1-D tiles, lane-misaligned static slices (~parity
    with the XLA formulation; superseded by dia_matvec_pallas)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x.shape[0]
    k = len(offsets)
    T = _TILE
    n_pad = -(-n // T) * T
    grid = n_pad // T

    xpad = jnp.zeros((n_pad + 2 * T,), dtype=x.dtype)
    xpad = jax.lax.dynamic_update_slice(xpad, x, (T,))
    dpad = jnp.zeros((k, n_pad), dtype=diags.dtype)
    dpad = jax.lax.dynamic_update_slice(dpad, diags, (0, 0))

    def kernel(xm_ref, xc_ref, xp_ref, d_ref, o_ref):
        w = jnp.concatenate([xm_ref[:], xc_ref[:], xp_ref[:]])
        acc = jnp.zeros((T,), dtype=o_ref.dtype)
        for kk, off in enumerate(offsets):
            acc = acc + d_ref[kk, :] * w[T + off:2 * T + off]   # static slice
        o_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((T,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T,), lambda i: (i + 1,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T,), lambda i: (i + 2,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad,), x.dtype),
    )(xpad, xpad, xpad, dpad)
    return out[:n]
