"""Pallas DIA-SpMV kernel tests.

Interpreter-mode tests run on any backend (CPU CI); compiled tests run on
TPU only.
"""

import numpy as np
import pytest

import jax.numpy as jnp
import scipy.sparse as sp

from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse import SparseDIA
from pyamg_tpu.sparse.pallas_kernels import (
    dia_matvec_pallas, dia_matvec_pallas_v2, pallas_available,
    pallas_dia_supported)


def _cases():
    rng = np.random.default_rng(0)
    A1 = poisson((512, 512), format="csr")
    A2 = poisson((300, 257), format="csr")
    n2 = A2.shape[0]
    A2 = sp.csr_matrix(A2
                       + 0.3 * sp.diags(rng.random(n2 - 258), 258)
                       + 0.2 * sp.diags(rng.random(n2 - 127), -127)
                       + 0.1 * sp.diags(rng.random(n2 - 5), 5))
    A3 = poisson((70001,), format="csr")
    return [A1, A2, A3]


class TestPallasInterpret:
    """Correctness in the Pallas interpreter (runs everywhere)."""

    @pytest.mark.parametrize("idx", [0, 1, 2])
    def test_halo_kernel_matches_xla(self, idx):
        A = _cases()[idx]
        D = SparseDIA.from_scipy(A).astype(jnp.float32)
        x = jnp.asarray(np.random.default_rng(1)
                        .random(A.shape[0]).astype(np.float32))
        y_ref = D.matvec_xla(x)
        y = dia_matvec_pallas(D.diags, D.offsets, x, interpret=True)
        assert float(jnp.abs(y_ref - y).max()) < 1e-5

    def test_2d_roll_kernel_matches_xla(self):
        A = _cases()[1]
        D = SparseDIA.from_scipy(A).astype(jnp.float32)
        x = jnp.asarray(np.random.default_rng(2)
                        .random(A.shape[0]).astype(np.float32))
        y_ref = D.matvec_xla(x)
        y = dia_matvec_pallas_v2(D.diags, D.offsets, x, interpret=True)
        assert float(jnp.abs(y_ref - y).max()) < 1e-5

    def test_support_gate(self):
        # CPU backend: never claims support; constraints checked structurally
        ok = pallas_dia_supported((-2048, -1, 0, 1, 2048),
                                  (4 << 20, 4 << 20), jnp.float32)
        assert ok == pallas_available()
        assert not pallas_dia_supported((0,), (100, 100), jnp.float32)
        assert not pallas_dia_supported((0, 100000), (1 << 20, 1 << 20),
                                        jnp.float32)


@pytest.mark.skipif(not pallas_available(),
                    reason="Pallas TPU backend not available")
class TestPallasCompiled:
    def test_matvec_dispatch_matches_xla(self):
        A = poisson((512, 512), format="csr")
        D = SparseDIA.from_scipy(A).astype(jnp.float32)
        x = jnp.asarray(np.random.default_rng(0)
                        .random(A.shape[0]).astype(np.float32))
        y_ref = D.matvec_xla(x)
        y_pal = D.matvec(x)     # dispatches to the Pallas kernel on TPU
        assert float(jnp.abs(y_ref - y_pal).max()) < 1e-5
