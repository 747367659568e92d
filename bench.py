"""Headline benchmark: per-chip SpMV throughput vs HBM roofline.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "nnz/s", "vs_baseline": N}

Headline: block-banded BSR SpMV through the Pallas kernel — the
roofline-capable sparse path on TPU (dense-block streaming, no per-element
indexing). Secondary (stderr): unstructured CSR SpMV through the XLA plan
path, which is gather-bound on this hardware.

Methodology notes (this environment tunnels the TPU through a relay):
- wall clock per dispatch includes per-execute input shipping, and
  ``block_until_ready`` can return before remote completion — so the kernel
  is timed by running K iterations *inside one compiled program* and
  differencing K1 vs K2 totals (shipping/compile cancels);
- identical (program, inputs) pairs are served from a result cache — every
  timed call carries a fresh scalar seed the kernel output depends on.

Baseline: the reference publishes no numbers (BASELINE.md); the target is
70 % of the HBM roofline for the format's minimal traffic. ``vs_baseline``
= achieved / (0.70 * roofline).
"""

from __future__ import annotations

import itertools
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

_HBM_GBPS = {"v4": 1228.0, "v5e": 819.0, "v5p": 2765.0, "v6e": 1640.0}
_seed = itertools.count(1)


def _hbm() -> float:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    for k, v in _HBM_GBPS.items():
        if k in gen:
            return v * 1e9
    return _HBM_GBPS["v5e"] * 1e9


def _loop_rate(matvec, x0, n_elems, *, k_lo=33, k_hi=129, reps=3):
    """On-device seconds/iteration of ``x -> normalize(matvec(x))``.

    Differences the totals of two loop lengths well above the dispatch
    floor (k=1 baselines proved noisy through the relay: shipping and
    grant overheads don't cancel cleanly at single-iteration scale)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        def body(i, xc):
            y = matvec(xc)
            return y / (jnp.max(jnp.abs(y)) + 1.0)
        return jax.lax.fori_loop(0, k, body, x)

    def timed(k):
        best = None
        xs = x0 * np.float32(1 + next(_seed) * 1e-6)
        _ = float(loop(xs, k=k)[0])  # compile + warm
        for _r in range(reps):
            xs = x0 * np.float32(1 + next(_seed) * 1e-6)
            t0 = time.perf_counter()
            _ = float(loop(xs, k=k)[0])  # scalar readback = real sync
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    d_lo = timed(k_lo)
    d_hi = timed(k_hi)
    return max((d_hi - d_lo) / (k_hi - k_lo), 1e-9)


def bench_bsr_banded(on_tpu: bool):
    """Block-tridiagonal BSR (128-blocks) SpMV — the headline."""
    import jax.numpy as jnp

    from spalinalg_tpu import BsrMatrix
    from spalinalg_tpu.dtypes import INDEX_DTYPE

    bs = 128
    nbr = 512 if on_tpu else 8  # streaming Pallas kernel path
    n = nbr * bs
    rng = np.random.default_rng(0)

    indptr = [0]
    indices = []
    for i in range(nbr):
        cols = [j for j in (i - 1, i, i + 1) if 0 <= j < nbr]
        indices.extend(cols)
        indptr.append(len(indices))
    nblocks = len(indices)
    data = rng.normal(size=(nblocks, bs, bs)).astype(np.float32)

    bsr = BsrMatrix._from_parts(
        n, n, bs, bs,
        jnp.asarray(np.asarray(indptr), dtype=INDEX_DTYPE),
        jnp.asarray(np.asarray(indices), dtype=INDEX_DTYPE),
        jnp.asarray(data),
    )
    x0 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    nnz = nblocks * bs * bs

    if on_tpu:
        per = _loop_rate(lambda v: bsr @ v, x0, nnz)
    else:
        per = _loop_rate(lambda v: bsr @ v, x0, nnz, k_lo=1, k_hi=3, reps=1)
    return nnz, per


def bench_bsr_banded_bf16(on_tpu: bool):
    """bf16 block storage, f32 accumulation — halves HBM value traffic."""
    import jax.numpy as jnp

    from spalinalg_tpu import BsrMatrix
    from spalinalg_tpu.dtypes import INDEX_DTYPE

    bs = 128
    nbr = 512 if on_tpu else 8
    n = nbr * bs
    rng = np.random.default_rng(0)

    indptr = [0]
    indices = []
    for i in range(nbr):
        cols = [j for j in (i - 1, i, i + 1) if 0 <= j < nbr]
        indices.extend(cols)
        indptr.append(len(indices))
    nblocks = len(indices)
    data = rng.normal(size=(nblocks, bs, bs)).astype(np.float32)

    bsr = BsrMatrix._from_parts(
        n, n, bs, bs,
        jnp.asarray(np.asarray(indptr), dtype=INDEX_DTYPE),
        jnp.asarray(np.asarray(indices), dtype=INDEX_DTYPE),
        jnp.asarray(data),
    ).astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    nnz = nblocks * bs * bs

    if on_tpu:
        per = _loop_rate(lambda v: bsr @ v, x0, nnz)
    else:
        per = _loop_rate(lambda v: bsr @ v, x0, nnz, k_lo=1, k_hi=3, reps=1)
    return nnz, per


def bench_dia_banded(on_tpu: bool):
    """Tridiagonal DIA SpMV — index-free streaming (no kernel needed)."""
    import jax.numpy as jnp

    from spalinalg_tpu import DiaMatrix

    n = 1 << 21 if on_tpu else 1 << 14
    rng = np.random.default_rng(0)
    diags = [rng.normal(size=n).astype(np.float32) for _ in range(3)]
    dia = DiaMatrix.from_diagonals(diags, [-1, 0, 1], n,
                                   dtype=np.float32)
    x0 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    nnz = dia.nnz
    if on_tpu:
        per = _loop_rate(lambda v: dia @ v, x0, nnz)
    else:
        per = _loop_rate(lambda v: dia @ v, x0, nnz, k_lo=1, k_hi=3,
                         reps=1)
    return nnz, per


def bench_csr_random(on_tpu: bool):
    """Unstructured CSR SpMV via the bucketed-gather plan (secondary)."""
    import jax.numpy as jnp

    from spalinalg_tpu import CsrMatrix
    from spalinalg_tpu.dtypes import INDEX_DTYPE

    n = 1 << 16 if on_tpu else 1 << 12
    row_nnz = 32
    nnz = n * row_nnz
    rng = np.random.default_rng(0)
    colind = np.sort(rng.integers(0, n, size=(n, row_nnz)), axis=1)
    rowptr = np.arange(n + 1, dtype=np.int64) * row_nnz
    values = rng.normal(size=nnz).astype(np.float32)
    csr = CsrMatrix._from_parts(
        n, n,
        jnp.asarray(rowptr, dtype=INDEX_DTYPE),
        jnp.asarray(colind.reshape(-1), dtype=INDEX_DTYPE),
        jnp.asarray(values),
    )
    x0 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    if on_tpu:
        per = _loop_rate(lambda v: csr @ v, x0, nnz, k_lo=9, k_hi=33)
    else:
        per = _loop_rate(lambda v: csr @ v, x0, nnz, k_lo=1, k_hi=3, reps=1)
    return nnz, per


def bench_spmm(on_tpu: bool):
    """CSR SpMM with 64 dense RHS columns (BASELINE config[1])."""
    import jax.numpy as jnp

    from spalinalg_tpu import CsrMatrix
    from spalinalg_tpu.dtypes import INDEX_DTYPE

    n = 1 << 14 if on_tpu else 1 << 10
    row_nnz, K = 32, 64
    nnz = n * row_nnz
    rng = np.random.default_rng(0)
    colind = np.sort(rng.integers(0, n, size=(n, row_nnz)), axis=1)
    rowptr = np.arange(n + 1, dtype=np.int64) * row_nnz
    values = rng.normal(size=nnz).astype(np.float32)
    csr = CsrMatrix._from_parts(
        n, n,
        jnp.asarray(rowptr, dtype=INDEX_DTYPE),
        jnp.asarray(colind.reshape(-1), dtype=INDEX_DTYPE),
        jnp.asarray(values),
    )
    X0 = jnp.asarray(rng.normal(size=(n, K)).astype(np.float32))

    def mm(X):
        return csr @ X

    # _loop_rate wants a vector-normalised loop; adapt for matrices
    import jax

    @partial(jax.jit, static_argnames=("k",))
    def loop(X, k):
        def body(i, Xc):
            Y = mm(Xc)
            return Y / (jnp.max(jnp.abs(Y)) + 1.0)
        return jax.lax.fori_loop(0, k, body, X)

    def timed(k, reps):
        best = None
        _ = float(loop(X0 * np.float32(1 + next(_seed) * 1e-6), k=k)[0, 0])
        for _r in range(reps):
            Xs = X0 * np.float32(1 + next(_seed) * 1e-6)
            t0 = time.perf_counter()
            _ = float(loop(Xs, k=k)[0, 0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    if on_tpu:
        d_lo, d_hi = timed(9, 3), timed(33, 3)
        per = max((d_hi - d_lo) / 24, 1e-9)
    else:
        d_lo, d_hi = timed(1, 1), timed(3, 1)
        per = max((d_hi - d_lo) / 2, 1e-9)
    return nnz, K, per


def bench_spgemm(on_tpu: bool):
    """SpGEMM on a power-law graph matrix (BASELINE config[2]).

    Times the numeric phase (plan cached): product terms per second."""
    import time

    import jax
    import jax.numpy as jnp

    from spalinalg_tpu import CsrMatrix
    from spalinalg_tpu.dtypes import INDEX_DTYPE
    from spalinalg_tpu.ops.spgemm import spgemm_apply, spgemm_plan

    n = 1 << 15 if on_tpu else 1 << 10
    rng = np.random.default_rng(1)
    # power-law out-degrees (Zipf), uniform targets
    deg = np.minimum(rng.zipf(1.8, size=n), 512)
    rowptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    nnz = int(rowptr[-1])
    colind = rng.integers(0, n, size=nnz)
    order = np.repeat(np.arange(n), deg)
    srt = np.lexsort((colind, order))
    colind = colind[srt]
    values = rng.normal(size=nnz).astype(np.float32)
    a = CsrMatrix._from_parts(
        n, n,
        jnp.asarray(rowptr, dtype=INDEX_DTYPE),
        jnp.asarray(colind, dtype=INDEX_DTYPE),
        jnp.asarray(values))
    plan = spgemm_plan(a, a)
    n_terms = int(plan.a_idx.shape[0])

    def run(seed):
        v = a.values * np.float32(1 + seed * 1e-6)
        out = spgemm_apply(plan, v, a.values)
        jax.block_until_ready(out)
        return out

    run(next(_seed))  # compile + warm (builds the device plans)
    reps = 5 if on_tpu else 2
    t0 = time.perf_counter()
    for _ in range(reps):
        run(next(_seed))
    per = (time.perf_counter() - t0) / reps
    return n_terms, per


def _arm_watchdog(seconds: float) -> None:
    """The tunnelled TPU can wedge on a lost device grant (claims spin
    forever). If the bench cannot produce a number in time, emit a zero
    metric line instead of hanging the harness."""
    import threading

    def fire():
        print(json.dumps({
            "metric": "bsr_banded_spmv_f32_nnz_per_s",
            "value": 0.0,
            "unit": "nnz/s",
            "vs_baseline": 0.0,
        }), flush=True)
        print("[bench] WATCHDOG: no result within "
              f"{seconds:.0f}s (device unreachable?)", file=sys.stderr)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()


def main() -> None:
    import jax

    _arm_watchdog(float(os.environ.get("BENCH_TIMEOUT_S", "1500")))
    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    hbm = _hbm()

    nnz_b, per_b = bench_bsr_banded(on_tpu)
    bsr_rate = nnz_b / per_b
    # BSR minimal traffic: 4B value / nnz (indices + x + y amortise away).
    bsr_roof = hbm / 4.0
    print(
        f"[bench] bsr_banded backend={backend} nnz={nnz_b} "
        f"{per_b*1e3:.3f} ms/spmv -> {bsr_rate/1e9:.2f} Gnnz/s "
        f"({100*bsr_rate/bsr_roof:.1f}% of {bsr_roof/1e9:.0f} Gnnz/s roofline)",
        file=sys.stderr,
    )

    secondary = {}
    try:
        nnz_h, per_h = bench_bsr_banded_bf16(on_tpu)
        bf16_rate = nnz_h / per_h
        bf16_roof = hbm / 2.0      # 2 B/nnz minimal traffic in bf16
        secondary["bsr_banded_spmv_bf16_nnz_per_s"] = round(bf16_rate, 1)
        secondary["bsr_bf16_roofline_frac"] = round(bf16_rate / bf16_roof, 4)
        print(
            f"[bench] bsr_banded_bf16 nnz={nnz_h} {per_h*1e3:.3f} ms/spmv -> "
            f"{bf16_rate/1e9:.2f} Gnnz/s ({100*bf16_rate/bf16_roof:.1f}% of "
            f"{bf16_roof/1e9:.0f} Gnnz/s bf16 roofline)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] bsr_bf16 failed: {e}", file=sys.stderr)

    try:
        nnz_d, per_d = bench_dia_banded(on_tpu)
        dia_rate = nnz_d / per_d
        dia_roof = hbm / 4.0     # value traffic only, like BSR
        secondary["dia_banded_spmv_nnz_per_s"] = round(dia_rate, 1)
        secondary["dia_roofline_frac"] = round(dia_rate / dia_roof, 4)
        print(
            f"[bench] dia_banded nnz={nnz_d} {per_d*1e3:.3f} ms/spmv -> "
            f"{dia_rate/1e9:.2f} Gnnz/s ({100*dia_rate/dia_roof:.1f}% of "
            f"{dia_roof/1e9:.0f} Gnnz/s roofline)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] dia_banded failed: {e}", file=sys.stderr)

    try:
        nnz_c, per_c = bench_csr_random(on_tpu)
        csr_rate = nnz_c / per_c
        csr_roof = hbm / 12.0
        secondary["csr_random_spmv_nnz_per_s"] = round(csr_rate, 1)
        secondary["csr_roofline_frac"] = round(csr_rate / csr_roof, 4)
        print(
            f"[bench] csr_random nnz={nnz_c} {per_c*1e3:.3f} ms/spmv -> "
            f"{csr_rate/1e9:.3f} Gnnz/s ({100*csr_rate/csr_roof:.1f}% of "
            f"{csr_roof/1e9:.0f} Gnnz/s roofline)",
            file=sys.stderr,
        )
    except Exception as e:  # secondary must never kill the headline
        print(f"[bench] csr_random failed: {e}", file=sys.stderr)

    try:
        nnz_m, K_m, per_m = bench_spmm(on_tpu)
        # traffic model per nnz: 4B value + 4B colind + K*4B X-row gather
        # + amortised Y writes -> flops = 2*nnz*K
        mm_flops = 2.0 * nnz_m * K_m / per_m
        mm_roof = hbm / (8.0 + 4.0 * K_m) * 2.0 * K_m  # flops at traffic roof
        secondary["csr_spmm_k64_gflops"] = round(mm_flops / 1e9, 2)
        secondary["csr_spmm_roofline_frac"] = round(mm_flops / mm_roof, 4)
        print(
            f"[bench] csr_spmm nnz={nnz_m} K={K_m} {per_m*1e3:.3f} ms -> "
            f"{mm_flops/1e9:.1f} GFLOP/s ({100*mm_flops/mm_roof:.1f}% of "
            f"{mm_roof/1e9:.0f} GFLOP/s traffic roofline)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] csr_spmm failed: {e}", file=sys.stderr)

    try:
        n_terms, per_g = bench_spgemm(on_tpu)
        g_rate = n_terms / per_g
        # numeric phase minimal traffic/term: two 4B value reads + routing
        g_roof = hbm / 24.0
        secondary["spgemm_powerlaw_terms_per_s"] = round(g_rate, 1)
        secondary["spgemm_roofline_frac"] = round(g_rate / g_roof, 4)
        print(
            f"[bench] spgemm_powerlaw terms={n_terms} {per_g*1e3:.3f} ms -> "
            f"{g_rate/1e9:.3f} Gterms/s ({100*g_rate/g_roof:.1f}% of "
            f"{g_roof/1e9:.0f} Gterms/s roofline)",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"[bench] spgemm failed: {e}", file=sys.stderr)

    target = 0.70 * bsr_roof
    print(json.dumps({
        "metric": "bsr_banded_spmv_f32_nnz_per_s",
        "value": round(bsr_rate, 1),
        "unit": "nnz/s",
        "vs_baseline": round(bsr_rate / target, 4),
        "tpu": os.environ.get("PALLAS_AXON_TPU_GEN", "v5e (default)"),
        "secondary": secondary,
    }))


if __name__ == "__main__":
    main()
