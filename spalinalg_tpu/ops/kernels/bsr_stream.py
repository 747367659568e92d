"""Streaming BSR kernel v2: one grid step per block, Pallas-pipelined.

The v1 kernel (`bsr_spmv.py`) issues its own chunk DMAs per block-row and
measured DMA-latency-bound (~100 GB/s). v2 inverts the structure: the grid
iterates over *blocks* and the block data rides an ordinary ``BlockSpec``
``(1, br, bc)`` window — Pallas's pipeline machinery then double-buffers
the HBM→VMEM stream across grid steps automatically, which is the intended
fast path.

Accumulation uses the revisit pattern: blocks are ordered by block-row, the
output block index map revisits the same ``y`` row while consecutive grid
steps share a row, and the kernel initialises on first touch. Block-rows
with zero blocks are cleaned up by a mask outside the kernel.

Scalar-prefetch operands: ``row_of_block`` and ``col_of_block`` (both
``(nblocks,)`` int32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_matvec_stream", "bsr_matmat_stream"]

# ----------------------------------------------------------------------
# v3: multi-block windows. v2's one-block-per-grid-step structure is
# overhead-bound (~260 ns/step measured vs the 78 ns HBM time of one
# 64 KiB f32 block): the per-step pipeline bookkeeping dominates. v3
# streams G blocks per grid step — the window DMA grows to G*br*bc*4
# bytes while the step overhead stays constant — and accumulates into a
# full-VMEM y buffer (zeroed at step 0), which removes both the revisit
# logic and the post-kernel row mask.
# ----------------------------------------------------------------------

# blocks per grid step. Measured on v5e (tools/tpu_tuning_results.jsonl):
# G=16 -> 192.5 Gnnz/s (770 GB/s, 94% of roofline) vs G=32 -> ~178 Gnnz/s.
# Smaller windows double-buffer better at this block count.
_V3_GROUP = 16
_V3_VMEM_BYTES = 4 << 20  # x / y single-buffer budget each
# Test-only hook: group chosen by the most recent *trace* of the v3
# kernel. A mutable module global — not thread-safe, and stale whenever
# a caller hits a jit cache instead of retracing. Tests use it to assert
# the config knob reached the kernel; production observability goes
# through utils.metrics.
_LAST_V3_GROUP = None


def _resolve_group(group) -> int:
    """Config fallback + validation for the v3 grid-window size.

    Only ``None`` means "use the default"; anything else must be a
    positive int (a bad Config value would otherwise surface as an
    opaque negative-grid Mosaic failure)."""
    if group is None:
        from ...config import current_config

        group = current_config().bsr_stream_group
        if group is None:
            return _V3_GROUP
    if not isinstance(group, int) or isinstance(group, bool) or group < 1:
        raise ValueError(
            f"bsr_stream_group must be a positive int or None, got {group!r}")
    return group


def _kernel_v3(row_ref, col_ref, blk_ref, x_ref, y_ref, *, G, nblocks):
    k = pl.program_id(0)

    @pl.when(k == jnp.int32(0))
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    def block(i, masked):
        idx = k * jnp.int32(G) + jnp.int32(i)

        def body():
            row = row_ref[idx]
            col = col_ref[idx]
            # cast x to the block dtype (bf16 storage -> bf16 x bf16 MXU
            # pass with f32 accumulation via preferred_element_type)
            xb = x_ref[col].astype(blk_ref.dtype)
            if blk_ref.dtype == jnp.bfloat16:
                # Mosaic can't lower a bf16 matrix x 1-D-vector dot
                # (and the (br,bc)x(1,bc) "vector-like rhs" form trips
                # an invalid bf16->f32 vector.broadcast). Use the
                # canonical (1,K)@(K,N) matmul on the transposed block:
                # (B x)^T = x^T B^T; the (128,128) transpose is free.
                prod = jnp.dot(
                    xb[None, :], blk_ref[i].T,
                    preferred_element_type=jnp.float32,
                )[0]
            else:
                prod = jnp.dot(
                    blk_ref[i], xb, preferred_element_type=jnp.float32
                )
            y_ref[row] = y_ref[row] + prod.astype(y_ref.dtype)

        if masked:
            pl.when(idx < jnp.int32(nblocks))(body)
        else:
            body()

    n_full = nblocks // G  # windows with no partial tail
    if n_full:
        @pl.when(k < jnp.int32(n_full))
        def _():
            for i in range(G):
                block(i, masked=False)

    if nblocks % G:
        @pl.when(k >= jnp.int32(n_full))
        def _():
            for i in range(G):
                block(i, masked=True)


def _v3_eligible(nbr, nblocks, br, bc, x_dtype, data_dtype) -> bool:
    if nblocks == 0:
        return False
    if bc % 128 or br % 8:
        return False  # lane/sublane alignment of x rows and y rows
    if data_dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return nbr * br * 4 <= _V3_VMEM_BYTES  # y is f32, single VMEM buffer


def stream_v3_arrays(row_of_block, col_of_block, data, x2, *, nbr,
                     nblocks, group=None, interpret=False):
    """v3 kernel on explicit (padded) block arrays.

    ``row_of_block``/``col_of_block`` are (npad,) int32 (may be traced —
    e.g. shard_map operands), ``data`` (npad, br, bc), ``x2`` (nbc, bc)
    f32. Padding blocks must carry zero data (they accumulate harmlessly
    into their ``row_of_block`` slot). ``group=None`` reads
    ``Config.bsr_stream_group`` (so the knob governs every caller,
    including the distributed path)."""
    npad, br, bc = data.shape
    G = min(_resolve_group(group), npad)

    # index-map literals must be i32 everywhere (including the implicit
    # maps of full-array specs): weak-i64 constants (package-global
    # jax_enable_x64) fail Mosaic's func.return legalization.
    _z = lambda: jnp.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(-(-npad // G),),
        in_specs=[
            pl.BlockSpec((G, br, bc), lambda k, *_: (k, _z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(x2.shape, lambda k, *_: (_z(), _z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nbr, br), lambda k, *_: (_z(), _z()),
                               memory_space=pltpu.VMEM),
    )
    fn = pl.pallas_call(
        partial(_kernel_v3, G=G, nblocks=nblocks),
        out_shape=jax.ShapeDtypeStruct((nbr, br), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )
    return fn(row_of_block, col_of_block, data, x2)


def _stream_call_v3(indptr, indices, data, x, *, interpret, group=None):
    import numpy as np

    # tunable per deployment without code edits (Config is jit-static)
    group = _resolve_group(group)
    nbr = indptr.shape[0] - 1
    nblocks, br, bc = data.shape
    G = min(group, nblocks)
    global _LAST_V3_GROUP
    _LAST_V3_GROUP = G
    npad = -(-nblocks // G) * G

    ip = np.asarray(indptr)
    rows_np = np.repeat(np.arange(nbr, dtype=np.int32), np.diff(ip))
    rows_np = np.pad(rows_np, (0, npad - nblocks))
    row_of_block = jnp.asarray(rows_np, jnp.int32)
    cols_pad = jnp.zeros(npad, jnp.int32).at[:nblocks].set(
        indices.astype(jnp.int32))

    x2 = x.reshape(-1, bc).astype(jnp.float32)
    return stream_v3_arrays(row_of_block, cols_pad, data, x2, nbr=nbr,
                            nblocks=nblocks, group=G, interpret=interpret)


def _kernel_v2(row_ref, col_ref, blk_ref, x_ref, y_ref, *, K):
    k = pl.program_id(0)
    row = row_ref[k]
    col = col_ref[k]
    blk = blk_ref[0]
    xb = x_ref[col].astype(blk.dtype)
    prod = (
        jax.lax.dot_general(
            blk, xb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if K > 1
        else jnp.dot(blk, xb, preferred_element_type=jnp.float32)
    )
    prod = prod.astype(y_ref.dtype)

    first = jnp.logical_or(
        k == jnp.int32(0),
        row != row_ref[jnp.maximum(k - jnp.int32(1), jnp.int32(0))],
    )

    if K > 1:
        # out block revisits this row while consecutive ks share it
        @pl.when(first)
        def _():
            y_ref[...] = prod

        @pl.when(jnp.logical_not(first))
        def _():
            y_ref[...] = y_ref[...] + prod
    else:
        @pl.when(first)
        def _():
            y_ref[row] = prod

        @pl.when(jnp.logical_not(first))
        def _():
            y_ref[row] = y_ref[row] + prod


def _stream_call(indptr, indices, data, x, *, K, interpret):
    with jax.enable_x64(False):
        return _stream_call_inner(indptr, indices, data, x, K=K,
                                  interpret=interpret)


def _stream_call_inner(indptr, indices, data, x, *, K, interpret):
    import numpy as np

    nbr = indptr.shape[0] - 1
    nblocks, br, bc = data.shape
    ip = np.asarray(indptr)
    row_of_block = jnp.asarray(
        np.repeat(np.arange(nbr, dtype=np.int32), np.diff(ip)), jnp.int32
    )
    row_counts = jnp.asarray(np.diff(ip) > 0)

    x = x.reshape(-1, bc) if K == 1 else x.reshape(-1, bc, K)

    if K == 1:
        out_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((nbr, br), x.dtype)
    else:
        out_spec = pl.BlockSpec(
            (br, K), lambda k, row_ref, col_ref: (row_ref[k], 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((nbr * br, K), x.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max(nblocks, 1),),
        in_specs=[
            pl.BlockSpec((1, br, bc), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
    )
    fn = pl.pallas_call(
        partial(_kernel_v2, K=K),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )
    y = fn(row_of_block, indices, data, x)
    # zero block-rows that own no blocks (kernel never touched them)
    if K == 1:
        return jnp.where(row_counts[:, None], y, 0)
    return jnp.where(jnp.repeat(row_counts, br)[:, None], y, 0)


def bsr_matvec_stream(bsr, x: jax.Array, *, interpret: bool = False):
    """``y = A @ x`` via the streaming (auto-pipelined) kernel."""
    nbr = bsr.nrows // bsr.blocksize[0]
    if _v3_eligible(nbr, bsr.n_blocks, *bsr.blocksize, x.dtype,
                    bsr.data.dtype):
        y = _stream_call_v3(bsr.indptr, bsr.indices, bsr.data, x,
                            interpret=interpret)
        return y.reshape(-1)[: bsr.nrows].astype(x.dtype)
    y = _stream_call(bsr.indptr, bsr.indices, bsr.data, x, K=1,
                     interpret=interpret)
    return y.reshape(-1)[: bsr.nrows]


def bsr_matmat_stream(bsr, X: jax.Array, *, interpret: bool = False):
    """``Y = A @ X`` via the streaming kernel."""
    Y = _stream_call(bsr.indptr, bsr.indices, bsr.data, X,
                     K=int(X.shape[1]), interpret=interpret)
    return Y[: bsr.nrows]
