"""Pallas kernel tests (run on TPU; skipped on the CPU test platform)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyamg_tpu.sparse.pallas_kernels import dia_matvec_pallas, \
    pallas_available


@pytest.mark.skipif(not pallas_available(),
                    reason="Pallas TPU backend not available")
class TestPallasDIA:
    def test_matches_xla(self):
        from pyamg_tpu.sparse import SparseDIA
        from pyamg_tpu.gallery import poisson

        A = poisson((512, 512), format="csr")
        D = SparseDIA.from_scipy(A).astype(jnp.float32)
        x = jnp.asarray(np.random.default_rng(0)
                        .random(A.shape[0]).astype(np.float32))
        y_ref = D.matvec(x)
        y_pal = dia_matvec_pallas(D.diags, D.offsets, x)
        assert float(jnp.abs(y_ref - y_pal).max()) < 1e-5
