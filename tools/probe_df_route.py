"""TPU probe: double-float CSR route — accuracy vs f64 oracle + slope.

Run ON TPU only (the DF kernel is Mosaic-only).
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from spalinalg_tpu import CsrMatrix
from spalinalg_tpu.dtypes import INDEX_DTYPE


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    n, row_nnz = 1 << 15, 32
    colind = np.sort(rng.integers(0, n, size=(n, row_nnz)), axis=1)
    rowptr = np.arange(n + 1, dtype=np.int64) * row_nnz
    values = rng.normal(size=n * row_nnz)
    csr = CsrMatrix._from_parts(
        n, n, jnp.asarray(rowptr, dtype=INDEX_DTYPE),
        jnp.asarray(colind.reshape(-1), dtype=INDEX_DTYPE),
        jnp.asarray(values))  # f64
    x = rng.normal(size=n)
    from spalinalg_tpu.ops import matvec as mv

    xj = jnp.asarray(x)
    assert xj.dtype == jnp.float64, xj.dtype
    t0 = time.perf_counter()
    elig = mv._route_df_eligible(csr, xj)
    print("df eligible:", elig)
    plan = mv._route_plan(csr)
    print(f"plan build {time.perf_counter()-t0:.1f}s K={plan.K} T={plan.T} "
          f"S={plan.S} spill_frac={plan.spill_frac:.4f} "
          f"has_spill_plan={plan.spill_plan is not None}")

    t0 = time.perf_counter()
    y = csr @ xj
    jax.block_until_ready(y)
    print(f"first call {time.perf_counter()-t0:.1f}s")

    # accuracy vs numpy f64 oracle
    import scipy.sparse as ss

    sp = ss.csr_matrix((values, colind.reshape(-1), rowptr), shape=(n, n))
    ref = sp @ x
    scale = np.abs(sp).dot(np.abs(x)) + 1e-300
    rel = (np.abs(np.asarray(y) - ref) / scale).max()
    print(f"rel err vs f64 oracle: {rel:.3e}")
    f32err = (np.abs(sp.astype(np.float32) @ x.astype(np.float32) - ref)
              / scale).max()
    print(f"(f32 SpMV err for scale: {f32err:.3e})")

    # slope timing
    from spalinalg_tpu.ops.kernels.csr_route_df import route_spmv_df

    @partial(jax.jit, static_argnames=("k",))
    def loop(xx, k):
        def it(i, xc):
            yy = route_spmv_df(plan, xc, csr.values)
            return (yy / (jnp.max(jnp.abs(yy)) + 1.0)).astype(xc.dtype)
        return jax.lax.fori_loop(0, k, it, xx)

    nnz = n * row_nnz
    totals = {}
    for k in (8, 40, 72):
        r = loop(xj, k=k)
        jax.block_until_ready(r)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(xj, k=k))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        totals[k] = best
        print(f"k={k}: {best*1e3:.1f} ms")
    ks = sorted(totals)
    slopes = sorted((totals[b] - totals[a]) / (b - a)
                    for i, a in enumerate(ks) for b in ks[i + 1:])
    per = slopes[len(slopes) // 2]
    print(f"per-iter {per*1e3:.3f} ms -> {nnz/per/1e9:.2f} Gnnz/s "
          f"({100*nnz/per/(819e9/20):.1f}% of f64 20B/nnz roofline)")


if __name__ == "__main__":
    main()
