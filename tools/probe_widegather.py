"""Probe: Mosaic lane-gather from a WIDE (64, N) VMEM-resident operand.

The SpMM redesign candidate (ROADMAP r6 #1) lays the RHS panel
transposed (ncol, nrows) so "gather rows of X" becomes a LANE gather
shared across all columns: one take on a (ncol, 128)-shaped output
delivers 128 entries x ncol columns, and the per-slot index is a
(1, 128) vector broadcast over sublanes. The crux is whether
tpu.dynamic_gather lowers when the OPERAND has more lanes than the
output (idx values span the full N, not 128).

Run on the v5e:  python tools/probe_widegather.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 16384          # operand lanes (X rows)
NCOL = 64          # RHS columns (sublanes)
TAKES = 256        # takes per kernel call


def _wide_take(src, idx):
    """out[s, l] = src[s, idx[s, l]] with src (NCOL, N), idx (NCOL, 128)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return jax.lax.gather(
        src, idx[..., None], dnums, (1, 1),
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.FILL_OR_DROP, fill_value=0.0)


def _kernel(xt_ref, idx_ref, val_ref, o_ref):
    acc = jnp.zeros((NCOL, 128), jnp.float32)
    xt = xt_ref[...]
    for k in range(TAKES):
        ix = jnp.broadcast_to(idx_ref[k][None, :], (NCOL, 128))
        hk = _wide_take(xt, ix)
        acc = acc + hk * val_ref[k][None, :]
    o_ref[...] = acc


def main():
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.normal(size=(NCOL, N)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(TAKES, 128)).astype(np.int32))
    val = jnp.asarray(rng.normal(size=(TAKES, 128)).astype(np.float32))

    fn = pl.pallas_call(
        _kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NCOL, 128), jnp.float32),
    )

    @jax.jit
    def loop(xt, idx, val, k):
        def it(i, acc):
            return acc + fn(xt, idx, val)
        return jax.lax.fori_loop(0, k, it,
                                 jnp.zeros((NCOL, 128), jnp.float32))

    try:
        out = jax.block_until_ready(fn(xt, idx, val))
    except Exception as e:
        print(f"WIDE GATHER UNSUPPORTED: {e!r}"[:500])
        return
    # correctness
    ref = np.zeros((NCOL, 128), np.float32)
    for k in range(TAKES):
        ref += np.asarray(xt)[:, np.asarray(idx)[k]] * np.asarray(val)[k]
    err = np.abs(np.asarray(out) - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"wide gather OK, rel err {err:.2e}")

    ts = {}
    for k in (8, 40, 72):
        jax.block_until_ready(loop(xt, idx, val, k))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(xt, idx, val, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    per_call = (ts[72] - ts[8]) / 64
    per_take = per_call / TAKES
    elems = NCOL * 128
    print(f"per take {per_take*1e6:.3f} us -> "
          f"{elems/per_take/1e9:.1f} Gelem/s gathered")


if __name__ == "__main__":
    main()
