"""Streaming DIA SpMV: a Pallas kernel for diagonal-format matrices.

``y[i] = sum_k data[k, i] * x[i + off_k]`` — every access is a
*statically shifted* window, so the kernel needs no gathers at all:

- The padded operand ``x`` sits whole in VMEM (it is small relative to
  the diagonal data: one vector vs D of them); each grid step slices a
  ``(R + smax + 1, 128)`` sublane window once.
- A shift by ``d = s*128 + r`` in the row-major ``(sublane, lane)``
  layout is two static slices and one lane concat:
  ``seg = concat(W[s:s+R, r:], W[s+1:s+R+1, :r], axis=1)`` —
  pure vreg moves, compile-time resolved (offsets are structure).
- Diagonal data streams through normal block pipelining (the dominant
  traffic: D*n*4 bytes vs n*4 for x and y), multiply-adds on the VPU.

Single pass over data, x and y — the minimal-traffic formulation
``(4 + 8/D) B per stored nnz``. The XLA `dynamic_slice` formulation
(`formats/dia.py`) re-materialises x per diagonal at XLA's whim and
measured anywhere between 45 % and 92 % of that bound (probe r3);
this kernel exists to make the number deterministic (VERDICT r3 weak
#6).

Reference scope: DIA is beyond-reference (`scipy.sparse.dia_matrix`
peer); SpMV intent only in `csr.rs:16-17`.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_spmv", "dia_stream_eligible"]

_LANE = 128
_R = 128                     # sublanes per tile -> 16384 rows per step
_MAX_X_VMEM = 24 << 20       # resident-x budget (VMEM is ~128 MiB on
                             # v5e — measured, not the 16 MB folklore)
_MAX_DIAGS = 64


def dia_stream_eligible(offsets, nrows: int, ncols: int, dtype) -> bool:
    """Kernel dispatch gate: f32 math, x resident in VMEM, few diags."""
    if jnp.result_type(dtype, jnp.float32) != jnp.float32:
        return False
    offsets = np.asarray(offsets)
    if not (1 <= offsets.size <= _MAX_DIAGS):
        return False
    _, _, _, nsub = _pack(offsets, nrows, ncols)
    return nsub * _LANE * 4 <= _MAX_X_VMEM


def _dia_kernel(x_ref, d_ref, o_ref, *, shifts, R):
    t = pl.program_id(0)
    smax = max(s for s, _ in shifts)
    W = x_ref[pl.ds(t * jnp.int32(R), R + smax + 1), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANE), 1)
    acc = jnp.zeros((R, _LANE), jnp.float32)
    for k, (s, r) in enumerate(shifts):
        if r == 0:
            seg = W[s:s + R, :]
        else:
            # lane shift by r with sublane carry: roll(128 - r) maps
            # lane -> (lane + r) % 128; lanes that wrapped read the
            # next sublane (Mosaic has no misaligned lane concat).
            # i32 shift: a Python int traces weak-i64 under the
            # package-global jax_enable_x64 and fails Mosaic
            C = pltpu.roll(W[s:s + R + 1, :], jnp.int32(_LANE - r),
                           axis=1)
            seg = jnp.where(lane < _LANE - r, C[:R], C[1:R + 1])
        acc = acc + d_ref[k] * seg
    o_ref[...] = acc


@partial(jax.jit, static_argnames=("shifts", "T", "nrows", "interpret"))
def _dia_call(xp2, data3, *, shifts, T, nrows, interpret=False):
    _z = lambda: jnp.int32(0)
    D = data3.shape[0]
    fn = pl.pallas_call(
        partial(_dia_kernel, shifts=shifts, R=_R),
        grid=(T,),
        in_specs=[
            # resident x: explicit whole-array block + i32 index map
            # (the default map's literal zeros trace weak-i64 under
            # jax_enable_x64 and Mosaic fails to legalize func.return)
            pl.BlockSpec(xp2.shape, lambda t: (_z(), _z()),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, _R, _LANE), lambda t: (_z(), t, _z()),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_R, _LANE), lambda t: (t, _z()),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T * _R, _LANE), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
    )
    y = fn(xp2, data3)
    return y.reshape(-1)[:nrows]


def _pack(offsets, nrows, ncols):
    """Static geometry: (shifts, T, lo, nsub) for the kernel call."""
    offsets = np.asarray(offsets, dtype=np.int64)
    lo = int(-min(int(offsets.min(initial=0)), 0))
    T = -(-nrows // (_R * _LANE))
    d = offsets + lo
    shifts = tuple((int(dd) // _LANE, int(dd) % _LANE) for dd in d)
    smax = max(s for s, _ in shifts)
    nsub = T * _R + smax + 1
    return shifts, T, lo, nsub


@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4, 5))
def _dia_spmv_ad(offsets, data, x, nrows, ncols, interpret):
    return _dia_spmv_impl(offsets, data, x, nrows, ncols, interpret)


def _dia_spmv_impl(offsets, data, x, nrows, ncols, interpret):
    shifts, T, lo, nsub = _pack(offsets, nrows, ncols)
    xf = x.astype(jnp.float32)
    xp2 = jnp.zeros((nsub * _LANE,), jnp.float32)
    # clip: slots beyond the largest shifted access are never read
    nc = min(ncols, nsub * _LANE - lo)
    xp2 = xp2.at[lo: lo + nc].set(xf[:nc]).reshape(nsub, _LANE)
    df = data.astype(jnp.float32)
    D = df.shape[0]
    d3 = jnp.zeros((D, T * _R * _LANE), jnp.float32)
    d3 = d3.at[:, :nrows].set(df[:, :nrows]).reshape(D, T * _R, _LANE)
    return _dia_call(xp2, d3, shifts=shifts, T=T, nrows=nrows,
                     interpret=interpret)


def _shift_seg(xf, o, lo, nrows):
    """``seg[i] = x[i + o]`` for i in [0, nrows) (zeros out of range)."""
    xp = jnp.pad(xf, (lo, nrows))  # nrows of tail pad always suffices
    return jax.lax.dynamic_slice_in_dim(xp, int(o) + lo, nrows, axis=0)


def _dia_spmv_fwd(offsets, data, x, nrows, ncols, interpret):
    return (_dia_spmv_impl(offsets, data, x, nrows, ncols, interpret),
            (data, x))


def _dia_spmv_bwd(offsets, nrows, ncols, interpret, res, g):
    data, x = res
    offs = np.asarray(offsets, dtype=np.int64)
    lo = int(-min(int(offs.min(initial=0)), 0))
    gf = g.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    df = data.astype(jnp.float32)
    # d data[k, i] = g[i] * x[i + o_k]  (same shifts as forward)
    ddata = jnp.stack([gf * _shift_seg(xf, o, lo, nrows) for o in offs])
    # dx[j] = sum_k data[k, j - o_k] * g[j - o_k]: reverse shifts of
    # the per-diagonal products, accumulated in a padded buffer
    # (o <= ncols-1 so lo + ncols + nrows slots always cover j + o).
    dxp = jnp.zeros(lo + ncols + nrows, jnp.float32)
    for k, o in enumerate(offs):
        prod = df[k, :nrows] * gf
        dxp = jax.lax.dynamic_update_slice_in_dim(
            dxp, jax.lax.dynamic_slice_in_dim(dxp, int(o) + lo, nrows,
                                              axis=0) + prod,
            int(o) + lo, axis=0)
    dx = dxp[lo: lo + ncols]
    return ddata.astype(data.dtype), dx.astype(x.dtype)


_dia_spmv_ad.defvjp(_dia_spmv_fwd, _dia_spmv_bwd)


def dia_spmv(offsets, data, x, nrows, ncols, *, interpret=False):
    """``y = A @ x`` for row-aligned DIA ``A`` through the streaming
    Pallas kernel. Differentiable in ``data`` and ``x`` (closed-form
    shift VJP)."""
    return _dia_spmv_ad(tuple(int(o) for o in np.asarray(offsets)),
                        data, x, int(nrows), int(ncols), interpret)
