"""Microbenchmark: DIA SpMV variants on the real TPU.

Timing method (axon tunnel: D2H ~35-85 ms, block_until_ready unreliable):
time a chained loop of ``iters`` matvecs ended by a dependent scalar fetch,
at two iteration counts, and divide the difference — tunnel latency and
dispatch overhead cancel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse import SparseDIA
from pyamg_tpu.sparse.pallas_kernels import (dia_matvec_pallas,
                                             dia_matvec_pallas_v1,
                                             dia_matvec_pallas_v2)

G = 2048
ITERS_LO, ITERS_HI = 10, 110


def chained(fn, iters):
    @jax.jit
    def run(diags, x):
        def body(i, v):
            return fn(diags, v)
        y = jax.lax.fori_loop(0, iters, body, x)
        return y[0], y

    return run


def time_variant(name, fn, D, x, nbytes):
    runs = {k: chained(fn, k) for k in (ITERS_LO, ITERS_HI)}
    # compile + warm both programs
    for k, r in runs.items():
        s, _ = r(D.diags, x)
        float(s)
    ts = {}
    for k, r in runs.items():
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            s, _ = r(D.diags, x)
            float(s)                      # dependent scalar fetch
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    per = (ts[ITERS_HI] - ts[ITERS_LO]) / (ITERS_HI - ITERS_LO)
    gbs = nbytes / per / 1e9
    print(f"{name:28s} {per*1e6:9.1f} us/matvec   {gbs:7.1f} GB/s effective")
    return per


def main():
    print(f"backend={jax.default_backend()}  grid={G}x{G}")
    A = poisson((G, G), format="csr")
    D = SparseDIA.from_scipy(A, dtype=np.float32)
    # scale to spectral radius <= 1 so chained matvecs stay finite
    D = SparseDIA(diags=D.diags / 8.0, offsets=D.offsets, shape=D.shape)
    n = A.shape[0]
    k = D.n_offsets
    x = jnp.asarray(np.random.default_rng(0).random(n, dtype=np.float32))

    # ideal traffic: diags once, x once, y once
    nbytes = (k + 2) * n * 4
    print(f"n={n}  k={k}  ideal traffic/matvec = {nbytes/1e6:.1f} MB "
          f"-> {nbytes/819e9*1e6:.0f} us at v5e peak")

    y0 = np.asarray(D.matvec_xla(x))
    y2 = np.asarray(dia_matvec_pallas(D.diags, D.offsets, x))
    print("v2 vs xla max err:", np.abs(y0 - y2).max())

    time_variant("XLA shift-mult-add", lambda d, v: SparseDIA(
        diags=d, offsets=D.offsets, shape=D.shape).matvec_xla(v), D, x, nbytes)
    time_variant("pallas v1 (1-D tiles)", lambda d, v: dia_matvec_pallas_v1(
        d, D.offsets, v), D, x, nbytes)
    time_variant("pallas v2 (2-D + rolls)", lambda d, v: dia_matvec_pallas_v2(
        d, D.offsets, v), D, x, nbytes)
    time_variant("pallas halo (hot path)", lambda d, v: dia_matvec_pallas(
        d, D.offsets, v), D, x, nbytes)

    # bf16 diagonals, f32 vectors (mixed precision; halves diag traffic)
    Db = SparseDIA(diags=D.diags.astype(jnp.bfloat16), offsets=D.offsets,
                   shape=D.shape)
    yb = np.asarray(dia_matvec_pallas(Db.diags, Db.offsets, x))
    print("halo-bf16 vs xla rel err:",
          np.abs(np.asarray(y0) - yb).max() / np.abs(y0).max())
    nbytes_b = (k * 2 + 2 * 4) * n
    time_variant("pallas halo bf16 diags",
                 lambda d, v: dia_matvec_pallas(d, D.offsets, v),
                 Db, x, nbytes_b)


if __name__ == "__main__":
    main()
