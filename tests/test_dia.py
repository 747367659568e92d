"""DIA format (`formats/dia.py`). Oracle: scipy.sparse.dia / dense."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from spalinalg_tpu import CooMatrix, CsrMatrix, DiaMatrix
from spalinalg_tpu.errors import ShapeError


def _tridiag(n):
    return DiaMatrix.from_diagonals([-1.0, 2.0, -1.0], [-1, 0, 1], n)


def test_matvec_matches_scipy(rng):
    n = 64
    offs = [-5, -1, 0, 2, 7]
    diags = [rng.normal(size=n) for _ in offs]
    A = DiaMatrix.from_diagonals(diags, offs, n)
    s = sps.diags([d[: n - abs(o)] for d, o in zip(diags, offs)], offs,
                  shape=(n, n))
    x = rng.normal(size=n)
    got = np.asarray(A @ x)
    ref = s.toarray() @ x
    # row-aligned vs scipy col-aligned: compare through OUR to_dense
    np.testing.assert_allclose(got, np.asarray(A.to_dense()) @ x,
                               atol=1e-10)
    assert got.shape == ref.shape


def test_dense_and_csr_roundtrip(rng):
    n = 32
    A = _tridiag(n)
    d = np.asarray(A.to_dense())
    ref = (np.diag(np.full(n, 2.0)) + np.diag(np.full(n - 1, -1.0), 1)
           + np.diag(np.full(n - 1, -1.0), -1))
    np.testing.assert_allclose(d, ref, atol=1e-12)
    back = DiaMatrix.from_csr(A.to_csr())
    np.testing.assert_allclose(np.asarray(back.to_dense()), ref,
                               atol=1e-12)


def test_rectangular(rng):
    A = DiaMatrix.from_diagonals([np.arange(1.0, 5.0), 7.0], [1, -1],
                                 4, ncols=6)
    d = np.asarray(A.to_dense())
    assert d.shape == (4, 6)
    x = rng.normal(size=6)
    np.testing.assert_allclose(np.asarray(A @ x), d @ x, atol=1e-10)


def test_transpose(rng):
    n = 24
    offs = [-2, 0, 3]
    A = DiaMatrix.from_diagonals([rng.normal(size=n) for _ in offs],
                                 offs, n)
    np.testing.assert_allclose(np.asarray(A.T.to_dense()),
                               np.asarray(A.to_dense()).T, atol=1e-12)


def test_matmat(rng):
    n = 40
    A = _tridiag(n)
    X = rng.normal(size=(n, 8))
    np.testing.assert_allclose(np.asarray(A @ X),
                               np.asarray(A.to_dense()) @ X, atol=1e-10)


def test_jit_and_grad(rng):
    import jax.numpy as jnp

    n = 16
    A = _tridiag(n)
    x = rng.normal(size=n)
    f = jax.jit(lambda v: jnp.sum(A @ v))
    g = jax.grad(lambda v: jnp.sum(A @ v))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(A.to_dense()).sum(axis=0),
                               atol=1e-8)
    assert np.isfinite(float(f(x)))


def test_validation():
    with pytest.raises(ShapeError):
        DiaMatrix.from_diagonals([1.0], [9], 3)
    with pytest.raises(ShapeError):
        DiaMatrix.from_diagonals([1.0, 2.0], [0], 3)
    with pytest.raises(ShapeError):
        DiaMatrix(0, 3, [0], np.zeros((1, 1)))
    A = _tridiag(4)
    with pytest.raises(ShapeError):
        A @ np.ones(5)


def test_from_csr_rejects_scattered(rng):
    n = 40
    d = np.where(rng.random((n, n)) < 0.3, rng.normal(size=(n, n)), 0)
    rows, cols = np.nonzero(d)
    csr = CsrMatrix.from_coo(CooMatrix.with_triplets(
        n, n, rows.tolist(), cols.tolist(), d[rows, cols].tolist()))
    # dense random structure has ~2n-1 distinct diagonals; allowed only
    # because band = n; verify it at least round-trips correctly
    A = DiaMatrix.from_csr(csr)
    np.testing.assert_allclose(np.asarray(A.to_dense()), d, atol=1e-12)


# ---------------------------------------------------------------------
# Streaming Pallas kernel (ops/kernels/dia_stream) — interpret mode
# replays the exact kernel math on CPU.
# ---------------------------------------------------------------------

def test_dia_stream_kernel_matches_xla(rng):
    from spalinalg_tpu.ops.kernels.dia_stream import dia_spmv

    for (n, m, offs) in [(4096, 4096, [-1, 0, 1]),
                         (5000, 5000, [-130, -1, 0, 7, 129, 257]),
                         (300, 1000, [0, 5, 600]),
                         (1000, 300, [-299, -1, 0, 200])]:
        data = rng.normal(size=(len(offs), n)).astype(np.float32)
        dia = DiaMatrix(n, m, offs, jnp.asarray(data))
        x = rng.normal(size=m).astype(np.float32)
        ref = np.asarray(dia._matvec_xla(jnp.asarray(x)))
        y = np.asarray(dia_spmv(offs, jnp.asarray(data), jnp.asarray(x),
                                n, m, interpret=True))
        np.testing.assert_allclose(y, ref, atol=1e-4)


def test_dia_stream_kernel_grads(rng):
    from spalinalg_tpu.ops.kernels.dia_stream import dia_spmv

    n, offs = 512, [-2, 0, 3]
    data = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))
    g = jnp.asarray(rng.normal(size=n).astype(np.float32))

    def f(d, xx):
        return jnp.vdot(g, dia_spmv(offs, d, xx, n, n, interpret=True))

    def f_ref(d, xx):
        return jnp.vdot(g, DiaMatrix(n, n, offs, d)._matvec_xla(xx))

    gd, gx = jax.grad(f, argnums=(0, 1))(data, x)
    rd, rx = jax.grad(f_ref, argnums=(0, 1))(data, x)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(rd), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)


def test_dia_stream_eligibility_gates():
    from spalinalg_tpu.ops.kernels.dia_stream import dia_stream_eligible

    assert dia_stream_eligible([-1, 0, 1], 4096, 4096, np.float32)
    assert not dia_stream_eligible([-1, 0, 1], 4096, 4096, np.float64)
    # resident x beyond the VMEM budget
    assert not dia_stream_eligible([0], 1 << 26, 1 << 26, np.float32)
