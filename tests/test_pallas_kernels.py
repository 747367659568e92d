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


class TestBsrStreamV3:
    """The multi-block-window kernel requires 128-lane blocks; driven
    directly through stream_v3-eligible shapes in interpret mode."""

    def _v3_case(self, rng, nbr, bs=128, band=1):
        from spalinalg_tpu import BsrMatrix
        import jax.numpy as jnp

        n = nbr * bs
        indptr = [0]
        indices = []
        for i in range(nbr):
            cols = [j for j in range(i - band, i + band + 1) if 0 <= j < nbr]
            indices.extend(cols)
            indptr.append(len(indices))
        data = rng.normal(size=(len(indices), bs, bs)).astype(np.float32)
        bsr = BsrMatrix._from_parts(
            n, n, bs, bs,
            jnp.asarray(np.asarray(indptr), dtype=jnp.int32),
            jnp.asarray(np.asarray(indices), dtype=jnp.int32),
            jnp.asarray(data))
        dense = np.zeros((n, n), np.float32)
        rows = np.repeat(np.arange(nbr), np.diff(np.asarray(indptr)))
        for k, (r, c) in enumerate(zip(rows, indices)):
            dense[r*bs:(r+1)*bs, c*bs:(c+1)*bs] += data[k]
        return bsr, dense

    def test_eligibility(self, rng):
        from spalinalg_tpu.ops.kernels.bsr_stream import _v3_eligible
        import jax.numpy as jnp

        assert _v3_eligible(4, 10, 128, 128, jnp.float32, jnp.float32)
        assert _v3_eligible(4, 10, 128, 128, jnp.float32, jnp.bfloat16)
        assert not _v3_eligible(4, 10, 8, 8, jnp.float32, jnp.float32)
        assert not _v3_eligible(4, 0, 128, 128, jnp.float32, jnp.float32)

    @pytest.mark.parametrize("nbr", [2, 5])
    def test_v3_parity(self, rng, nbr):
        from spalinalg_tpu.ops.kernels.bsr_stream import bsr_matvec_stream

        bsr, dense = self._v3_case(rng, nbr)
        x = rng.normal(size=dense.shape[1]).astype(np.float32)
        y = bsr_matvec_stream(bsr, jnp.asarray(x), interpret=True)
        np.testing.assert_allclose(np.asarray(y), dense @ x,
                                   rtol=2e-4, atol=2e-4)

    def test_v3_group_tail(self, rng):
        """nblocks not divisible by the window size exercises the masked
        tail window."""
        from spalinalg_tpu.ops.kernels.bsr_stream import _stream_call_v3

        bsr, dense = self._v3_case(rng, 3)  # 7 blocks
        x = rng.normal(size=dense.shape[1]).astype(np.float32)
        for group in (2, 3, 7, 16):
            y = _stream_call_v3(bsr.indptr, bsr.indices, bsr.data,
                                jnp.asarray(x), interpret=True, group=group)
            np.testing.assert_allclose(
                np.asarray(y).reshape(-1)[: dense.shape[0]], dense @ x,
                rtol=2e-4, atol=2e-4)

    def test_v3_bf16_storage(self, rng):
        """bf16 block storage, f32 accumulation (BsrMatrix.astype)."""
        from spalinalg_tpu.ops.kernels.bsr_stream import bsr_matvec_stream

        bsr, dense = self._v3_case(rng, 3)
        b16 = bsr.astype(jnp.bfloat16)
        assert b16.dtype == jnp.bfloat16
        x = rng.normal(size=dense.shape[1]).astype(np.float32)
        y = bsr_matvec_stream(b16, jnp.asarray(x), interpret=True)
        # oracle mirrors the kernel: both operands bf16-rounded, f32 accum
        xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
        ref = dense.astype(jnp.bfloat16).astype(np.float32) @ xb
        tol = 2e-2 * float(np.abs(ref).max())
        np.testing.assert_allclose(np.asarray(y), ref, rtol=0, atol=tol)
        assert np.asarray(y).dtype == np.float32

    def test_v2_bf16_storage(self, rng):
        from spalinalg_tpu.ops.kernels.bsr_stream import bsr_matvec_stream

        bsr, d = _bsr_of(rng, 64, 64, 0.2, 8)   # bs=8 -> v2 path
        b16 = bsr.astype(jnp.bfloat16)
        x = rng.normal(size=64).astype(np.float32)
        y = bsr_matvec_stream(b16, jnp.asarray(x), interpret=True)
        ref = d.astype(jnp.bfloat16).astype(np.float32) @ x
        np.testing.assert_allclose(np.asarray(y), ref, rtol=3e-2, atol=3e-2)

    def test_xla_path_bf16(self, rng):
        """The einsum fallback also honours bf16 storage + f32 accum."""
        bsr, d = _bsr_of(rng, 64, 64, 0.2, 8)
        b16 = bsr.astype(jnp.bfloat16)
        x = rng.normal(size=64).astype(np.float32)
        y = b16 @ jnp.asarray(x)
        ref = d.astype(jnp.bfloat16).astype(np.float32) @ x
        np.testing.assert_allclose(np.asarray(y), ref, rtol=3e-2, atol=3e-2)
