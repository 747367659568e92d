"""Pallas BSR SpMV/SpMM kernel — the flagship per-chip compute path.

Measured op landscape on the target TPU (v5e): XLA per-element gathers and
scatters serialise (~0.1 Gelem/s) while dense streams run at ~1 TB/s and the
MXU at ~170 TFLOPs. The roofline-capable sparse representation is therefore
**dense blocks**: BSR rows of ``(br, bc)`` blocks whose products are dense
matvecs/matmuls — no per-element indexing anywhere.

Kernel design (one grid step per block-row, TPU grid is sequential):
- ``indptr``/``indices`` ride scalar prefetch (SMEM) so block counts and
  x-slice offsets are available for control flow and DMA addressing;
- block data stays in HBM and is DMA'd into a double-buffered VMEM scratch
  in chunks of ``C`` blocks, overlapping the next chunk's copy with the
  current chunk's compute;
- the operand vector/matrix lives wholly in VMEM (callers tile columns
  beyond VMEM capacity);
- each block product is ``(br, bc) @ (bc,)`` (or ``@ (bc, K)``) with f32
  accumulation; the row block of ``y`` is written once per grid step.

Traffic per stored block ≈ ``br*bc*dtype_bytes`` for values + 4 bytes of
index — asymptotically the dense-block roofline.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_matvec_pallas", "bsr_matmat_pallas"]


def _kernel(indptr_ref, indices_ref, data_ref, x_ref, y_ref, scratch, sem,
            *, C, br, bc, K):
    # Every literal is explicitly int32/float32: under x64, weak python
    # scalars trace as i64/f64 whose converts recurse in Mosaic lowering.
    C32 = jnp.int32(C)
    one = jnp.int32(1)
    i = pl.program_id(0)
    start = indptr_ref[i]
    end = indptr_ref[i + 1]
    count = end - start

    nblocks_padded = data_ref.shape[0]

    def chunk_dma(slot, c):
        base = jnp.minimum(start + c * C32, jnp.int32(nblocks_padded - C))
        return pltpu.make_async_copy(
            data_ref.at[pl.ds(base, C)], scratch.at[slot], sem.at[slot]
        )

    n_chunks = (count + C32 - one) // C32

    @pl.when(n_chunks > jnp.int32(0))
    def _():
        chunk_dma(jnp.int32(0), jnp.int32(0)).start()

    def chunk_body(c, acc):
        c = jnp.asarray(c, jnp.int32)
        slot = c % jnp.int32(2)

        @pl.when(c + one < n_chunks)
        def _():
            chunk_dma(one - slot, c + one).start()

        chunk_dma(slot, c).wait()

        def blk_body(j, acc):
            k = start + c * C32 + jnp.asarray(j, jnp.int32)
            valid = k < end
            col = indices_ref[jnp.minimum(k, jnp.int32(nblocks_padded - 1))]
            # x is pre-reshaped to (ncols/bc, bc[, K]): a dynamic
            # leading-axis row load needs no alignment proof, unlike a
            # dynamic 1-D slice (Mosaic "multiple of" verification).
            xb = x_ref[col]
            blk = scratch[slot, j]
            prod = jax.lax.dot_general(
                blk, xb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) if K > 1 else jnp.dot(
                blk, xb, preferred_element_type=jnp.float32
            )
            return acc + jnp.where(valid, prod, jnp.float32(0.0))

        # int32 bounds: under x64 a python-int bound becomes an in-kernel
        # int64 induction var, whose convert lowering recurses in Mosaic.
        return jax.lax.fori_loop(jnp.int32(0), jnp.int32(C), blk_body, acc)

    acc0 = jnp.zeros((br,) if K == 1 else (br, K), dtype=jnp.float32)
    acc = jax.lax.fori_loop(jnp.int32(0), n_chunks, chunk_body, acc0)
    if K == 1:
        # full-array VMEM output, dynamic row store (a (1, br) block would
        # violate the 8-sublane block rule)
        y_ref[i] = acc.astype(y_ref.dtype)
    else:
        y_ref[...] = acc.astype(y_ref.dtype)


def _call(indptr, indices, data, x, *, K, chunk_blocks, interpret):
    # Trace the kernel with x64 OFF: global x64 makes python-int literals in
    # index maps and grid bookkeeping trace as i64, which Mosaic refuses
    # ("failed to legalize" / recursive converts). All operands here are
    # i32/f32/bf16, so the local scope changes nothing semantically.
    with jax.enable_x64(False):
        return _call_inner(indptr, indices, data, x, K=K,
                           chunk_blocks=chunk_blocks, interpret=interpret)


def _call_inner(indptr, indices, data, x, *, K, chunk_blocks, interpret):
    nbr = indptr.shape[0] - 1
    nblocks, br, bc = data.shape
    C = min(chunk_blocks, max(nblocks, 1))
    # Pad the block stream (data AND indices) so chunk DMAs and the
    # clamped scalar reads never run past the end.
    pad = C
    data_p = jnp.concatenate(
        [data, jnp.zeros((pad, br, bc), data.dtype)], axis=0
    )
    indices = jnp.concatenate(
        [indices, jnp.zeros((pad,), indices.dtype)]
    )

    # Output is 2-D (nbr, br): XLA tiles 1-D f32 arrays T(512), which
    # clashes with a (br,) Mosaic block; 2-D uses the standard (8,128) tile.
    # K == 1 keeps the whole output in VMEM (dynamic row stores); K > 1
    # blocks by (br, K).
    out_shape = (nbr, br) if K == 1 else (nbr * br, K)
    if K == 1:
        out_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        out_spec = pl.BlockSpec((br, K), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    x = x.reshape(-1, bc) if K == 1 else x.reshape(-1, bc, K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbr,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # block data (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x / X
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, C, br, bc), data.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        partial(_kernel, C=C, br=br, bc=bc, K=K),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    return fn(indptr, indices, data_p, x)


def bsr_matvec_pallas(bsr, x: jax.Array, *, chunk_blocks: int = 8,
                      interpret: bool = False) -> jax.Array:
    """``y = A @ x`` for BSR A — Pallas kernel, double-buffered block DMA."""
    y = _call(bsr.indptr, bsr.indices, bsr.data, x,
              K=1, chunk_blocks=chunk_blocks, interpret=interpret)
    return y.reshape(-1)[: bsr.nrows]


def bsr_matmat_pallas(bsr, X: jax.Array, *, chunk_blocks: int = 8,
                      interpret: bool = False) -> jax.Array:
    """``Y = A @ X`` for BSR A and dense ``(ncols, K)`` X in VMEM."""
    Y = _call(bsr.indptr, bsr.indices, bsr.data, X,
              K=int(X.shape[1]), chunk_blocks=chunk_blocks,
              interpret=interpret)
    return Y[: bsr.nrows]
