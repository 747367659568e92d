"""Microbench: shape-preserving dynamic_gather rates on (S,128) tiles.

Mosaic supports take_along_axis(src, idx, axis) only with
src.shape == idx.shape == out.shape (2-D). Measure:
 - axis=1 (lane gather) rate on (512,128) tiles
 - axis=0 (sublane gather) rate + correctness across 512 sublanes
 - the composed 4-gather SpMV routing pipeline rate
"""
import itertools
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_seed = itertools.count(1)
S = 512  # tile sublanes


def loop_rate(fn, x0, k2=17, reps=2):
    @partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        def body(i, xc):
            y = fn(xc)
            return xc * (1.0 + 1e-9 * jnp.sum(y[:1, :1]))
        return jax.lax.fori_loop(0, k, body, x)

    def timed(k):
        xs = x0 * np.float32(1 + next(_seed) * 1e-6)
        t0 = time.perf_counter()
        _ = float(loop(xs, k=k).reshape(-1)[0])
        return time.perf_counter() - t0

    _ = timed(1)
    d1 = min(timed(1) for _ in range(reps))
    _ = timed(k2)
    d2 = min(timed(k2) for _ in range(reps))
    return max((d2 - d1) / (k2 - 1), 1e-9)


def bench_axis(axis, nsteps=32):
    rng = np.random.default_rng(0)
    hi = 128 if axis == 1 else S
    idx = jnp.asarray(rng.integers(0, hi, size=(nsteps, S, 128)), jnp.int32)

    def kern(x_ref, i_ref, o_ref):
        o_ref[0] = jnp.take_along_axis(x_ref[...], i_ref[0], axis=axis)

    call = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, S, 128), jnp.float32),
    )

    x0 = jnp.asarray(rng.normal(size=(S, 128)).astype(np.float32))
    out = np.asarray(call(x0, idx))
    xs = np.asarray(x0)
    ix = np.asarray(idx)
    ref = (np.take_along_axis(xs[None].repeat(nsteps, 0).reshape(-1, 128),
                              ix.reshape(-1, 128), axis=axis and 1)
           if axis == 1 else
           np.stack([np.take_along_axis(xs, ix[t], axis=0)
                     for t in range(nsteps)]).reshape(-1, 128))
    err = float(np.abs(out.reshape(-1, 128) - ref).max())
    per = loop_rate(lambda x: call(x, idx), x0)
    n = nsteps * S * 128
    print(f"gather axis={axis}: {per*1e3:8.3f} ms -> {n/per/1e9:7.2f} "
          f"Glookup/s (maxerr {err:g})", flush=True)


def bench_spmv_pipe(nsteps=32, K=32):
    """Composed pipeline: wbcast-sublane-g, lane-g, sublane-g, lane-g,
    mul, K-slice accumulate. Random index arrays (rate only, no
    correctness — routing tables come later)."""
    rng = np.random.default_rng(0)
    shp = (nsteps, S, 128)
    wb = jnp.asarray(rng.integers(0, S, size=shp), jnp.int32)
    la1 = jnp.asarray(rng.integers(0, 128, size=shp), jnp.int32)
    sb = jnp.asarray(rng.integers(0, S, size=shp), jnp.int32)
    la2 = jnp.asarray(rng.integers(0, 128, size=shp), jnp.int32)
    vals = jnp.asarray(rng.normal(size=shp).astype(np.float32))
    R = S // K

    def kern(x_ref, wb_ref, l1_ref, sb_ref, l2_ref, v_ref, o_ref):
        g = jnp.take_along_axis(x_ref[...], wb_ref[0], axis=0)
        g = jnp.take_along_axis(g, l1_ref[0], axis=1)
        g = jnp.take_along_axis(g, sb_ref[0], axis=0)
        g = jnp.take_along_axis(g, l2_ref[0], axis=1)
        prod = v_ref[0] * g
        acc = jnp.zeros((R, 128), jnp.float32)
        for k in range(K):
            acc = acc + prod[k * R:(k + 1) * R]
        o_ref[0] = acc

    bs = lambda i: (i, 0, 0)
    call = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((S, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec((1, S, 128), bs, memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec((1, R, 128), bs, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsteps, R, 128), jnp.float32),
    )

    x0 = jnp.asarray(rng.normal(size=(S, 128)).astype(np.float32))
    per = loop_rate(lambda x: call(x, wb, la1, sb, la2, vals), x0)
    n = nsteps * S * 128
    print(f"spmv-pipe K={K}: {per*1e3:8.3f} ms -> {n/per/1e9:7.2f} Gnnz/s",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    bench_axis(1)
    bench_axis(0)
    bench_spmv_pipe()


if __name__ == "__main__":
    main()
