"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from spalinalg_tpu import CooMatrix, CsrMatrix
from spalinalg_tpu.ops.kernels.bsr_spmv import (
    bsr_matmat_pallas,
    bsr_matvec_pallas,
)


def _bsr_of(rng, n, m, density, bs):
    d = np.where(rng.random((n, m)) < density, rng.normal(size=(n, m)), 0)
    d = d.astype(np.float32)
    coo = CooMatrix(n, m, dtype=np.float32)
    for i, j in zip(*np.nonzero(d)):
        coo.push(int(i), int(j), float(d[i, j]))
    return CsrMatrix.from_coo(coo).to_bsr(bs), d


class TestBsrPallas:
    @pytest.mark.parametrize("n,m,bs", [(32, 32, 8), (64, 48, 8), (40, 40, 8)])
    def test_matvec_parity(self, rng, n, m, bs):
        bsr, d = _bsr_of(rng, n, m, 0.2, bs)
        x = rng.normal(size=m).astype(np.float32)
        y = bsr_matvec_pallas(bsr, jnp.asarray(x), interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=2e-5, atol=2e-5)

    def test_matvec_empty_rows(self, rng):
        # block-rows with zero blocks must produce zeros
        bsr, d = _bsr_of(rng, 64, 64, 0.02, 8)
        x = rng.normal(size=64).astype(np.float32)
        y = bsr_matvec_pallas(bsr, jnp.asarray(x), interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=2e-5, atol=2e-5)

    def test_matvec_chunk_boundary(self, rng):
        # rows with more blocks than the DMA chunk exercise multi-chunk loop
        bsr, d = _bsr_of(rng, 32, 256, 0.6, 8)
        x = rng.normal(size=256).astype(np.float32)
        y = bsr_matvec_pallas(bsr, jnp.asarray(x), chunk_blocks=2,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=2e-5, atol=3e-5)

    def test_matmat_parity(self, rng):
        bsr, d = _bsr_of(rng, 48, 64, 0.2, 8)
        X = rng.normal(size=(64, 16)).astype(np.float32)
        Y = bsr_matmat_pallas(bsr, jnp.asarray(X), interpret=True)
        np.testing.assert_allclose(np.asarray(Y), d @ X, rtol=2e-5, atol=3e-5)


class TestBsrStream:
    @pytest.mark.parametrize("n,m,bs", [(32, 32, 8), (64, 48, 8)])
    def test_matvec_parity(self, rng, n, m, bs):
        from spalinalg_tpu.ops.kernels.bsr_stream import bsr_matvec_stream

        bsr, d = _bsr_of(rng, n, m, 0.2, bs)
        x = rng.normal(size=m).astype(np.float32)
        y = bsr_matvec_stream(bsr, jnp.asarray(x), interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=2e-5, atol=2e-5)

    def test_matvec_empty_rows(self, rng):
        from spalinalg_tpu.ops.kernels.bsr_stream import bsr_matvec_stream

        bsr, d = _bsr_of(rng, 64, 64, 0.02, 8)
        x = rng.normal(size=64).astype(np.float32)
        y = bsr_matvec_stream(bsr, jnp.asarray(x), interpret=True)
        np.testing.assert_allclose(np.asarray(y), d @ x, rtol=2e-5, atol=2e-5)

    def test_matmat_parity(self, rng):
        from spalinalg_tpu.ops.kernels.bsr_stream import bsr_matmat_stream

        bsr, d = _bsr_of(rng, 48, 64, 0.3, 8)
        X = rng.normal(size=(64, 16)).astype(np.float32)
        Y = bsr_matmat_stream(bsr, jnp.asarray(X), interpret=True)
        np.testing.assert_allclose(np.asarray(Y), d @ X, rtol=2e-5, atol=3e-5)
