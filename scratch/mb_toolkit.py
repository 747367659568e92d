"""Microbench: data-movement toolkit rates inside Pallas on v5e.

1. lane gather (take_along_axis axis=1) on (512,128)
2. sublane gather within (8,128) vregs (axis=0), batched as 64 vregs
3. transpose (128,128) blocks in-kernel
4. dynamic row loads from a VMEM ref (fori_loop, (1,128) rows)
5. pltpu.roll along sublanes of (512,128)
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
S = 512
NSTEPS = 32


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


def _mk(kern, n_in_streamed, out_shape_inner):
    bs = lambda i: (i, 0, 0)
    return pl.pallas_call(
        kern,
        grid=(NSTEPS,),
        in_specs=[pl.BlockSpec((S, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec((1, S, 128), bs, memory_space=pltpu.VMEM)]
                 * n_in_streamed,
        out_specs=pl.BlockSpec((1,) + out_shape_inner, bs,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSTEPS,) + out_shape_inner,
                                       jnp.float32),
    )


def report(name, per, n, extra=""):
    print(f"{name}: {per*1e3:8.3f} ms -> {n/per/1e9:7.2f} Gelem/s {extra}",
          flush=True)


def bench_lane_gather():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 128, size=(NSTEPS, S, 128)), jnp.int32)

    def kern(x_ref, i_ref, o_ref):
        big = jnp.broadcast_to(x_ref[...], (S, 128))
        o_ref[0] = jnp.take_along_axis(big, i_ref[0], axis=1)

    call = _mk(kern, 1, (S, 128))
    x0 = jnp.asarray(rng.normal(size=(S, 128)).astype(np.float32))
    out = np.asarray(call(x0, idx))[0]
    ref = np.take_along_axis(np.asarray(x0), np.asarray(idx)[0], axis=1)
    err = float(np.abs(out - ref).max())
    per = loop_rate(lambda x: call(x, idx), x0)
    report("lane-gather (512,128)", per, NSTEPS * S * 128, f"(maxerr {err:g})")


def bench_vreg_sublane_gather():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 8, size=(NSTEPS, S, 128)), jnp.int32)

    def kern(x_ref, i_ref, o_ref):
        x = x_ref[...]
        ix = i_ref[0]
        outs = []
        for b in range(S // 8):
            outs.append(jnp.take_along_axis(x[b * 8:(b + 1) * 8],
                                            ix[b * 8:(b + 1) * 8], axis=0))
        o_ref[0] = jnp.concatenate(outs, axis=0)

    call = _mk(kern, 1, (S, 128))
    x0 = jnp.asarray(rng.normal(size=(S, 128)).astype(np.float32))
    out = np.asarray(call(x0, idx))[0]
    xs, ix = np.asarray(x0), np.asarray(idx)[0]
    ref = np.concatenate([np.take_along_axis(xs[b*8:(b+1)*8],
                                             ix[b*8:(b+1)*8], axis=0)
                          for b in range(S // 8)])
    err = float(np.abs(out - ref).max())
    per = loop_rate(lambda x: call(x, idx), x0)
    report("vreg-sublane-gather", per, NSTEPS * S * 128, f"(maxerr {err:g})")


def bench_transpose():
    def kern(x_ref, d_ref, o_ref):
        x = x_ref[...] + d_ref[0]
        outs = [x[b * 128:(b + 1) * 128].T for b in range(S // 128)]
        o_ref[0] = jnp.concatenate(outs, axis=0)

    call = _mk(kern, 1, (S, 128))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(S, 128)).astype(np.float32))
    dummy = jnp.zeros((NSTEPS, S, 128), jnp.float32)
    out = np.asarray(call(x0, dummy))[0]
    xs = np.asarray(x0)
    ref = np.concatenate([xs[b*128:(b+1)*128].T for b in range(S // 128)])
    err = float(np.abs(out - ref).max())
    per = loop_rate(lambda x: call(x, dummy), x0)
    report("transpose 4x(128,128)", per, NSTEPS * S * 128, f"(maxerr {err:g})")


def bench_row_loads():
    rng = np.random.default_rng(0)
    widx = jnp.asarray(rng.integers(0, S, size=(NSTEPS, S, 128)), jnp.int32)

    def kern(x_ref, w_ref, o_ref, scratch):
        def body(s, _):
            scratch[s] = x_ref[w_ref[0, s, 0]]
            return 0
        jax.lax.fori_loop(0, S, body, 0)
        o_ref[0] = scratch[...]

    bs = lambda i: (i, 0, 0)
    call = pl.pallas_call(
        kern,
        grid=(NSTEPS,),
        in_specs=[
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), bs, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, 128), bs, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSTEPS, S, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, 128), jnp.float32)],
    )
    x0 = jnp.asarray(rng.normal(size=(S, 128)).astype(np.float32))
    out = np.asarray(call(x0, widx))[0]
    ref = np.asarray(x0)[np.asarray(widx)[0, :, 0]]
    err = float(np.abs(out - ref).max())
    per = loop_rate(lambda x: call(x, widx), x0)
    rows = NSTEPS * S
    print(f"dyn-row-loads: {per*1e3:8.3f} ms -> {rows/per/1e6:8.2f} Mrow/s "
          f"= {rows*128/per/1e9:7.2f} Gelem/s (maxerr {err:g})", flush=True)


def bench_roll():
    def kern(x_ref, d_ref, o_ref):
        x = x_ref[...] + d_ref[0]
        acc = x
        for sh in (1, 2, 4, 8, 16):
            acc = pltpu.roll(acc, sh, 0)
        o_ref[0] = acc

    call = _mk(kern, 1, (S, 128))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(S, 128)).astype(np.float32))
    dummy = jnp.zeros((NSTEPS, S, 128), jnp.float32)
    out = np.asarray(call(x0, dummy))[0]
    ref = np.roll(np.asarray(x0), 31, axis=0)
    err = float(np.abs(out - ref).max())
    per = loop_rate(lambda x: call(x, dummy), x0)
    report("5x roll axis0", per, NSTEPS * S * 128 * 5, f"(maxerr {err:g})")


def main():
    print("backend:", jax.default_backend(), flush=True)
    for fn in (bench_lane_gather, bench_vreg_sublane_gather, bench_transpose,
               bench_row_loads, bench_roll):
        try:
            fn()
        except Exception as e:
            print(f"{fn.__name__} FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    main()
