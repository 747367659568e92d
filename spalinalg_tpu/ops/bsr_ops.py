"""BSR compute: batched dense-block products on the MXU (north-star N4).

``Y[i] += B[i,j] @ X[j]`` over stored blocks — a batched matmul whose
operands are gathered by block-column index. Gathers are fast on TPU; the
block-row reduction uses the scatter-free segmented-reduction plan
(``ops.reduction``) because XLA scatter-add is serial on TPU (measured
0.1 Gnnz/s vs 65 Gelem/s gather on v5e).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..convert.engine import major_ids_device

__all__ = ["bsr_matvec", "bsr_matmat"]


def _block_products_vec(bsr, x):
    """Per-block ``data[k] @ x_block[indices[k]]`` -> (n_blocks, br)."""
    bc = bsr.blocksize[1]
    xb = x.reshape(bsr.ncols // bc, bc)[bsr.indices]       # (n_blocks, bc)
    acc = jnp.float32 if bsr.dtype == jnp.bfloat16 else jnp.result_type(bsr.dtype, x.dtype)
    return jnp.einsum(
        "kij,kj->ki", bsr.data, xb, preferred_element_type=acc
    )


@partial(jax.jit, static_argnames=("nbr",))
def _segment_rows(prod, indptr, *, nbr):
    n_blocks = prod.shape[0]
    brow = major_ids_device(indptr, n_blocks)
    return jax.ops.segment_sum(
        prod, brow, num_segments=nbr, indices_are_sorted=True
    )


_VMEM_OPERAND_BUDGET = 8 * 1024 * 1024  # operand bytes we let live in VMEM


def _use_pallas(bsr, operand_bytes: int) -> bool:
    from ..config import current_config

    if not current_config().use_pallas:
        return False
    if isinstance(bsr.indptr, jax.core.Tracer):
        return False  # structure must be concrete for the kernel call
    if jax.default_backend() == "cpu":
        return False  # interpret-mode is for tests; XLA path is faster on CPU
    if bsr.dtype not in (jnp.float32, jnp.bfloat16):
        return False  # f64 (XLA-emulated) stays on the XLA path
    return operand_bytes <= _VMEM_OPERAND_BUDGET


def bsr_matvec(bsr, x: jax.Array) -> jax.Array:
    """``y = A @ x`` for BSR A.

    On TPU with a VMEM-resident operand this dispatches to the Pallas
    streaming kernel (`kernels/bsr_stream.py`); otherwise the
    batched-einsum XLA path.
    """
    from ..utils.metrics import instrument

    nnz = bsr.nnz
    itm = jnp.dtype(bsr.dtype).itemsize
    return instrument("bsr_spmv", lambda: _bsr_matvec_impl(bsr, x),
                      nnz=nnz, flops=2 * nnz, bytes=itm * nnz)


def _df_dispatch(bsr, x) -> bool:
    from ..config import current_config
    from .kernels.bsr_df import df_eligible

    if not current_config().use_pallas:
        return False
    if jax.default_backend() != "tpu":
        # the double-float kernel is Mosaic-only: a gpu backend would
        # dispatch it and fail at lowering (ADVICE r4 low)
        return False
    if isinstance(bsr.indptr, jax.core.Tracer) or isinstance(
            bsr.data, jax.core.Tracer):
        return False  # hi/lo split artifacts are cached per structure
    nbr = bsr.nrows // bsr.blocksize[0]
    return df_eligible(nbr, bsr.n_blocks, *bsr.blocksize, bsr.dtype)


def _bsr_matvec_impl(bsr, x):
    if bsr.dtype == jnp.float64 and _df_dispatch(bsr, x):
        # double-float kernel: f64-class accuracy (~1e-15 rel) at f32
        # streaming speeds vs XLA's software-emulated f64 (~1900x)
        from .kernels.bsr_df import bsr_matvec_df

        return bsr_matvec_df(bsr, x)
    if _use_pallas(bsr, x.shape[0] * x.dtype.itemsize):
        from .kernels.bsr_stream import bsr_matvec_stream

        return bsr_matvec_stream(bsr, x)
    br = bsr.blocksize[0]
    nbr = bsr.nrows // br
    prod = _block_products_vec(bsr, x)                      # (n_blocks, br)
    y = _segment_rows(prod, bsr.indptr, nbr=nbr)            # (nbr, br)
    return y.reshape(bsr.nrows)


def bsr_matmat(bsr, X: jax.Array) -> jax.Array:
    """``Y = A @ X`` for BSR A and dense X — batched (br,bc)@(bc,K) matmuls
    on the MXU."""
    if _use_pallas(bsr, X.shape[0] * X.shape[1] * X.dtype.itemsize):
        from .kernels.bsr_stream import bsr_matmat_stream

        return bsr_matmat_stream(bsr, X)
    br, bc = bsr.blocksize
    nbr = bsr.nrows // br
    K = X.shape[1]
    Xb = X.reshape(bsr.ncols // bc, bc, K)[bsr.indices]     # (n_blocks, bc, K)
    acc = jnp.float32 if bsr.dtype == jnp.bfloat16 else jnp.result_type(bsr.dtype, X.dtype)
    prod = jnp.einsum(
        "kij,kjl->kil", bsr.data, Xb, preferred_element_type=acc
    )                                                       # (n_blocks, br, K)
    Y = _segment_rows(prod, bsr.indptr, nbr=nbr)            # (nbr, br, K)
    return Y.reshape(bsr.nrows, K)
