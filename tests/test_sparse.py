"""Sparse substrate tests: ELL/BELL containers vs scipy gold reference."""

import numpy as np
import pytest
import scipy.sparse as sp
import jax.numpy as jnp

from pyamg_tpu.sparse import SparseELL, BlockELL, spgemm, rap, transpose
from pyamg_tpu.gallery import poisson, sprand


def rng():
    return np.random.default_rng(42)


class TestSparseELL:
    def test_roundtrip(self):
        A = poisson((7, 9), format="csr")
        E = SparseELL.from_scipy(A)
        assert (E.to_scipy() != A).nnz == 0

    def test_roundtrip_random(self):
        A = sprand(50, 50, 0.1, seed=3).tocsr()
        E = SparseELL.from_scipy(A)
        assert np.allclose(E.to_scipy().toarray(), A.toarray())

    def test_rectangular(self):
        A = sprand(30, 17, 0.2, seed=1).tocsr()
        E = SparseELL.from_scipy(A)
        x = rng().standard_normal(17)
        assert np.allclose(np.asarray(E @ x), A @ x)

    def test_matvec(self):
        A = poisson((12, 13), format="csr")
        E = SparseELL.from_scipy(A)
        x = rng().standard_normal(A.shape[1])
        assert np.allclose(np.asarray(E.matvec(x)), A @ x, atol=1e-12)

    def test_rmatvec(self):
        A = sprand(20, 15, 0.3, seed=5).tocsr()
        E = SparseELL.from_scipy(A)
        y = rng().standard_normal(20)
        assert np.allclose(np.asarray(E.rmatvec(y)), A.T @ y, atol=1e-12)

    def test_matmat(self):
        A = poisson((8, 8), format="csr")
        E = SparseELL.from_scipy(A)
        X = rng().standard_normal((A.shape[1], 3))
        assert np.allclose(np.asarray(E.matmat(X)), A @ X, atol=1e-12)

    def test_diagonal(self):
        A = poisson((9, 4), format="csr")
        E = SparseELL.from_scipy(A)
        assert np.allclose(np.asarray(E.diagonal()), A.diagonal())

    def test_to_dense(self):
        A = sprand(12, 12, 0.4, seed=2).tocsr()
        E = SparseELL.from_scipy(A)
        assert np.allclose(np.asarray(E.to_dense()), A.toarray())

    def test_complex(self):
        A = poisson((6, 6), format="csr").astype(complex)
        A = A + 1j * sp.eye(A.shape[0])
        E = SparseELL.from_scipy(A.tocsr())
        x = rng().standard_normal(A.shape[0]) + 1j
        assert np.allclose(np.asarray(E @ x), A @ x)

    def test_jit_and_pytree(self):
        import jax

        A = poisson((5, 5), format="csr")
        E = SparseELL.from_scipy(A)
        x = rng().standard_normal(A.shape[0])

        @jax.jit
        def f(E, x):
            return E.matvec(x)

        assert np.allclose(np.asarray(f(E, x)), A @ x)

    def test_width_padding(self):
        A = poisson((5, 5), format="csr")
        E = SparseELL.from_scipy(A, width=8)
        assert E.width == 8
        x = rng().standard_normal(A.shape[0])
        assert np.allclose(np.asarray(E @ x), A @ x)

    def test_scale_rows_cols(self):
        A = poisson((6, 5), format="csr")
        E = SparseELL.from_scipy(A)
        s = rng().standard_normal(A.shape[0])
        assert np.allclose(E.scale_rows(s).to_scipy().toarray(),
                           (sp.diags(s) @ A).toarray())
        assert np.allclose(E.scale_cols(s).to_scipy().toarray(),
                           (A @ sp.diags(s)).toarray())


class TestBlockELL:
    def test_roundtrip(self):
        A = poisson((8, 8), format="csr")
        B = BlockELL.from_scipy(A, blocksize=2)
        assert np.allclose(B.to_scipy().toarray(), A.toarray())

    def test_matvec(self):
        A = poisson((8, 8), format="csr")
        B = BlockELL.from_scipy(A, blocksize=4)
        x = rng().standard_normal(A.shape[0])
        assert np.allclose(np.asarray(B @ x), A @ x)

    def test_block_diagonal(self):
        A = poisson((4, 4), format="csr")
        B = BlockELL.from_scipy(A, blocksize=2)
        D = np.asarray(B.block_diagonal())
        Ad = A.toarray()
        for i in range(A.shape[0] // 2):
            assert np.allclose(D[i], Ad[2 * i:2 * i + 2, 2 * i:2 * i + 2])


class TestOps:
    def test_spgemm(self):
        A = sprand(20, 15, 0.3, seed=1).tocsr()
        B = sprand(15, 25, 0.3, seed=2).tocsr()
        C = spgemm(A, B)
        assert np.allclose(C.to_scipy().toarray(), (A @ B).toarray())

    def test_rap(self):
        A = poisson((10, 10), format="csr")
        P = sprand(100, 25, 0.1, seed=3).tocsr()
        C = rap(P.T.tocsr(), A, P)
        assert np.allclose(C.to_scipy().toarray(), (P.T @ A @ P).toarray())

    def test_transpose(self):
        A = sprand(13, 8, 0.3, seed=4).tocsr()
        assert np.allclose(transpose(A).to_scipy().toarray(),
                           A.T.toarray())


class TestSparseDIAHostStaging:
    """Host-side (numpy) DIA staging used by setup finalize — zero device
    ops; gold reference is scipy."""

    def test_host_diags_roundtrip(self):
        from pyamg_tpu.sparse import SparseDIA
        A = poisson((6, 7), format="csr")
        diags, offs = SparseDIA.host_diags(A)
        D = SparseDIA.from_scipy(A)
        assert offs == D.offsets
        assert np.allclose(diags, np.asarray(D.diags))
        assert (D.to_scipy() != A).nnz == 0

    @pytest.mark.parametrize("shape", [(40, 40), (30, 18), (18, 30)])
    def test_host_transpose(self, shape):
        from pyamg_tpu.sparse import SparseDIA
        A = sp.random_array(shape, density=0.2, random_state=5,
                            format="csr") if hasattr(sp, "random_array") \
            else sp.random(*shape, density=0.2, random_state=5,
                           format="csr")
        diags, offs = SparseDIA.host_diags(A, max_offsets=1024)
        td, toffs = SparseDIA.host_transpose(diags, offs, shape)
        T = SparseDIA(diags=np.asarray(td), offsets=toffs,
                      shape=shape[::-1])
        assert np.allclose(T.to_scipy().toarray(), A.T.toarray())

    def test_host_transpose_complex(self):
        from pyamg_tpu.sparse import SparseDIA
        A = poisson((5, 5), format="csr").astype(complex)
        A.data = A.data * (1 + 0.3j)
        diags, offs = SparseDIA.host_diags(A)
        td, toffs = SparseDIA.host_transpose(diags, offs, A.shape)
        TH = SparseDIA(diags=np.asarray(td.conj()), offsets=toffs,
                       shape=A.shape[::-1])
        assert np.allclose(TH.to_scipy().toarray(),
                           A.conj().T.toarray())


class TestSparseBDIA:
    """Block diagonal-offset storage vs scipy BSR gold reference."""

    def _mk(self, nb=12, K=2, seed=0, noff=3):
        r = np.random.default_rng(seed)
        offs = sorted(r.choice(np.arange(-nb + 1, nb), size=noff,
                               replace=False).tolist())
        rows, cols, data = [], [], []
        for o in offs:
            rr = np.arange(max(0, -o), min(nb, nb - o))
            rows.append(rr)
            cols.append(rr + o)
            data.append(r.standard_normal((rr.size, K, K)))
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        data = np.concatenate(data)
        order = np.argsort(rows, kind="stable")
        indptr = np.concatenate([[0], np.cumsum(np.bincount(
            rows, minlength=nb))])
        A = sp.bsr_matrix((data[order], cols[order], indptr),
                          shape=(nb * K, nb * K), blocksize=(K, K))
        return A

    @pytest.mark.parametrize("K", [2, 3])
    def test_roundtrip_and_matvec(self, K):
        from pyamg_tpu.sparse import SparseBDIA
        A = self._mk(nb=15, K=K, seed=K)
        B = SparseBDIA.from_scipy_bsr(A)
        assert np.allclose(B.to_scipy().toarray(), A.toarray())
        x = np.random.default_rng(1).standard_normal(A.shape[0])
        assert np.allclose(np.asarray(B @ x), A @ x)
        X = np.random.default_rng(2).standard_normal((A.shape[0], 4))
        assert np.allclose(np.asarray(B @ X), A @ X)
        assert np.allclose(np.asarray(B.diagonal()),
                           A.tocsr().diagonal())

    def test_host_transpose(self):
        from pyamg_tpu.sparse import SparseBDIA
        A = self._mk(nb=10, K=2, seed=7)
        blocks, offs = SparseBDIA.host_blocks(A)
        tb, toffs = SparseBDIA.host_transpose(blocks, offs)
        T = SparseBDIA(blocks=jnp.asarray(tb), offsets=toffs,
                       shape=A.shape)
        assert np.allclose(T.to_scipy().toarray(), A.T.toarray())

    def test_host_transpose_conj(self):
        from pyamg_tpu.sparse import SparseBDIA
        A = self._mk(nb=8, K=2, seed=3).astype(complex)
        A.data = A.data * (1 + 0.5j)
        blocks, offs = SparseBDIA.host_blocks(A)
        tb, toffs = SparseBDIA.host_transpose(blocks, offs, conj=True)
        T = SparseBDIA(blocks=jnp.asarray(tb), offsets=toffs,
                       shape=A.shape)
        assert np.allclose(T.to_scipy().toarray(),
                           A.conj().T.toarray())
