"""Double-float (two-f32) streaming DIA SpMV: f64 stencil workloads at
f32 streaming speeds.

Same single-pass structure as the f32 kernel (`dia_stream.py`) — x
resident in VMEM, statically shifted windows, diagonal data streaming
through block pipelining — but every value rides as an exact (hi, lo)
f32 pair and the multiply-adds are error-free f32 transformations
(Dekker/Veltkamp TwoProd + Knuth TwoSum, shared with `bsr_df.py`):

- per diagonal: ``(p, e) = two_prod(d_hi, seg_hi)``,
  ``p_lo = e + d_hi*seg_lo + d_lo*seg_hi`` (the lo*lo cross term is
  ~2^-48 relative — dropped, same budget as bsr_df);
- accumulate into a double-float (acc_hi, acc_lo) register pair with
  one TwoSum per diagonal;
- the two f32 output planes recombine to f64 once, outside the kernel.

XLA's optimizer folds Dekker splits (measured: a jnp TwoSum chain loses
its error term); Mosaic preserves exact IEEE f32 — this math must live
in Pallas (docs/performance.md, r4 ground truth). Traffic is 8 B/nnz of
diagonal data (hi+lo planes) + the x/y planes amortised over D
diagonals: roofline ``HBM / (8 + 16/D)`` B/nnz, vs XLA's emulated f64
at ~0.1 % of roofline.

Reference scope: f64 is the reference's primary scalar
(`src/scalar.rs:56-57`); DIA itself is beyond-reference.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bsr_df import _two_prod, _two_sum, split_df
from .dia_stream import _LANE, _R, _pack

__all__ = ["dia_spmv_df", "dia_df_eligible", "split_x_planes"]

_MAX_X_VMEM = 24 << 20       # hi+lo resident-x planes together
_MAX_DIAGS = 48


def dia_df_eligible(offsets, nrows: int, ncols: int, dtype) -> bool:
    """Dispatch gate: f64 values, both x planes resident, few diags."""
    if dtype != jnp.float64:
        return False
    offsets = np.asarray(offsets)
    if not (1 <= offsets.size <= _MAX_DIAGS):
        return False
    _, _, _, nsub = _pack(offsets, nrows, ncols)
    return nsub * _LANE * 8 <= _MAX_X_VMEM


def _dia_df_kernel(xh_ref, xl_ref, dh_ref, dl_ref, yh_ref, yl_ref, *,
                   shifts, R):
    t = pl.program_id(0)
    smax = max(s for s, _ in shifts)
    Wh = xh_ref[pl.ds(t * jnp.int32(R), R + smax + 1), :]
    Wl = xl_ref[pl.ds(t * jnp.int32(R), R + smax + 1), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    acc_h = jnp.zeros((R, _LANE), jnp.float32)
    acc_l = jnp.zeros((R, _LANE), jnp.float32)
    for k, (s, r) in enumerate(shifts):
        if r == 0:
            seg_h = Wh[s:s + R, :]
            seg_l = Wl[s:s + R, :]
        else:
            # lane shift by r with sublane carry (see dia_stream)
            Ch = pltpu.roll(Wh[s:s + R + 1, :], jnp.int32(_LANE - r),
                            axis=1)
            Cl = pltpu.roll(Wl[s:s + R + 1, :], jnp.int32(_LANE - r),
                            axis=1)
            keep = lane < _LANE - r
            seg_h = jnp.where(keep, Ch[:R], Ch[1:R + 1])
            seg_l = jnp.where(keep, Cl[:R], Cl[1:R + 1])
        dh = dh_ref[k]
        dl = dl_ref[k]
        p, e = _two_prod(dh, seg_h)
        p_lo = e + dh * seg_l + dl * seg_h
        s2, e2 = _two_sum(acc_h, p)
        acc_l = acc_l + p_lo + e2
        acc_h = s2
    yh_ref[...] = acc_h
    yl_ref[...] = acc_l


@partial(jax.jit, static_argnames=("shifts", "T", "interpret"))
def _dia_df_planes_call(xh2, xl2, dh3, dl3, *, shifts, T,
                        interpret=False):
    """Plane-level entry: (xh2, xl2) padded VMEM planes in, (yh, yl)
    f32 planes out — zero f64 ops, so iterative DF callers (and the
    bench loop) never touch XLA's emulated f64 per step."""
    _z = lambda: jnp.int32(0)
    D = dh3.shape[0]
    fn = pl.pallas_call(
        partial(_dia_df_kernel, shifts=shifts, R=_R),
        grid=(T,),
        in_specs=[
            pl.BlockSpec(xh2.shape, lambda t: (_z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(xl2.shape, lambda t: (_z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, _R, _LANE), lambda t: (_z(), t, _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, _R, _LANE), lambda t: (_z(), t, _z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_R, _LANE), lambda t: (t, _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_R, _LANE), lambda t: (t, _z()),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((T * _R, _LANE), jnp.float32),
                   jax.ShapeDtypeStruct((T * _R, _LANE), jnp.float32)),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )
    return fn(xh2, xl2, dh3, dl3)


def _dia_df_call(xh2, xl2, dh3, dl3, *, shifts, T, nrows,
                 interpret=False):
    yh, yl = _dia_df_planes_call(xh2, xl2, dh3, dl3, shifts=shifts,
                                 T=T, interpret=interpret)
    y = (yh.astype(jnp.float64) + yl.astype(jnp.float64))
    return y.reshape(-1)[:nrows]


# data-plane prep (split + pad) is one emulated-f64 pass over the
# dominant operand — cached per matrix like bsr_df._df_blocks so
# repeated SpMVs (and the VJP) pay it once
from ...utils.plancache import StructureCache

_DIA_DF_CACHE = StructureCache(maxsize=8)


def _df_planes(data, nrows, T):
    def build():
        dh, dl = split_df(data)
        D = dh.shape[0]
        dh3 = jnp.zeros((D, T * _R * _LANE), jnp.float32).at[
            :, :nrows].set(dh[:, :nrows]).reshape(D, T * _R, _LANE)
        dl3 = jnp.zeros((D, T * _R * _LANE), jnp.float32).at[
            :, :nrows].set(dl[:, :nrows]).reshape(D, T * _R, _LANE)
        return (jax.block_until_ready(dh3), jax.block_until_ready(dl3))

    if isinstance(data, jax.core.Tracer):
        return build()  # trace-safe path, no caching by identity
    return _DIA_DF_CACHE.get((id(data), T), (data,), build)


def split_x_planes(x, offsets, nrows, ncols):
    """Pad + split an f64 operand into the kernel's (xh2, xl2) VMEM
    planes (the plane-level caller's companion to
    ``_dia_df_planes_call``)."""
    _, _, lo, nsub = _pack(offsets, nrows, ncols)
    xh, xl = split_df(x.astype(jnp.float64))
    # clip: slots beyond the largest shifted access are never read
    nc = min(ncols, nsub * _LANE - lo)
    xh2 = jnp.zeros((nsub * _LANE,), jnp.float32).at[
        lo: lo + nc].set(xh[:nc]).reshape(nsub, _LANE)
    xl2 = jnp.zeros((nsub * _LANE,), jnp.float32).at[
        lo: lo + nc].set(xl[:nc]).reshape(nsub, _LANE)
    return xh2, xl2


def _dia_spmv_df_impl(offsets, data, x, nrows, ncols, interpret):
    shifts, T, lo, nsub = _pack(offsets, nrows, ncols)
    xh2, xl2 = split_x_planes(x, offsets, nrows, ncols)
    dh3, dl3 = _df_planes(data, nrows, T)
    return _dia_df_call(xh2, xl2, dh3, dl3, shifts=shifts, T=T,
                        nrows=nrows, interpret=interpret)


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5))
def _dia_spmv_df_ad(offsets, data, x, nrows, ncols, interpret):
    return _dia_spmv_df_impl(offsets, data, x, nrows, ncols, interpret)


def _dia_spmv_df_fwd(offsets, data, x, nrows, ncols, interpret):
    return (_dia_spmv_df_impl(offsets, data, x, nrows, ncols, interpret),
            (data, x))


def _dia_spmv_df_bwd(offsets, nrows, ncols, interpret, res, g):
    # closed-form shift VJP, mirrored from dia_stream but in f64 (XLA
    # elementwise — gradients are off the hot path)
    data, x = res
    offs = np.asarray(offsets, dtype=np.int64)
    lo = int(-min(int(offs.min(initial=0)), 0))
    gf = g.astype(jnp.float64)
    xf = x.astype(jnp.float64)
    df = data.astype(jnp.float64)
    xp = jnp.pad(xf, (lo, nrows))
    ddata = jnp.stack([
        gf * jax.lax.dynamic_slice_in_dim(xp, int(o) + lo, nrows, axis=0)
        for o in offs])
    dxp = jnp.zeros(lo + ncols + nrows, jnp.float64)
    for k, o in enumerate(offs):
        prod = df[k, :nrows] * gf
        dxp = jax.lax.dynamic_update_slice_in_dim(
            dxp, jax.lax.dynamic_slice_in_dim(dxp, int(o) + lo, nrows,
                                              axis=0) + prod,
            int(o) + lo, axis=0)
    dx = dxp[lo: lo + ncols]
    return ddata.astype(data.dtype), dx.astype(x.dtype)


_dia_spmv_df_ad.defvjp(_dia_spmv_df_fwd, _dia_spmv_df_bwd)


def dia_spmv_df(offsets, data, x, nrows, ncols, *, interpret=False):
    """``y = A @ x`` for f64 row-aligned DIA ``A`` through the
    double-float streaming kernel; returns f64. Differentiable in
    ``data`` and ``x``."""
    return _dia_spmv_df_ad(tuple(int(o) for o in np.asarray(offsets)),
                           data, x, int(nrows), int(ncols), interpret)
