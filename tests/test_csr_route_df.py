"""Double-float routed CSR SpMV (`ops/kernels/csr_route_df.py`).

As with bsr_df (see tests/test_bsr_df.py docstring), the ~1e-15
accuracy claim holds only on the real Mosaic path — interpret mode
goes through XLA:CPU which rewrites the error-free transforms — so
this suite checks plumbing (routing correctness at f32-level
tolerance over the full spill/vrow machinery), the f64 VJP, and the
dispatch gates.
"""

import numpy as np
import pytest
import scipy.sparse as ss

import jax
import jax.numpy as jnp

from spalinalg_tpu import CsrMatrix
from spalinalg_tpu.dtypes import INDEX_DTYPE


def _random_csr(rng, n=1024, row_nnz=8, dtype=np.float64):
    colind = np.sort(rng.integers(0, n, size=(n, row_nnz)), axis=1)
    rowptr = np.arange(n + 1, dtype=np.int64) * row_nnz
    values = rng.normal(size=n * row_nnz).astype(dtype)
    sp = ss.csr_matrix((values, colind.reshape(-1), rowptr),
                       shape=(n, n))
    return rowptr, colind.reshape(-1).astype(np.int64), values, sp


def test_route_df_interpret_matches_oracle(rng):
    from spalinalg_tpu.ops.kernels.csr_route import build_route_plan
    from spalinalg_tpu.ops.kernels.csr_route_df import route_spmv_df

    ptr, col, vals, sp = _random_csr(rng)
    plan = build_route_plan(ptr, col, vals, 1024, 1024)
    x = rng.normal(size=1024)
    y = np.asarray(route_spmv_df(plan, jnp.asarray(x),
                                 jnp.asarray(vals), interpret=True))
    ref = sp @ x
    scale = np.abs(sp).dot(np.abs(x)) + 1e-300
    assert (np.abs(y - ref) / scale).max() < 1e-5


def test_route_df_heavy_rows_and_spill(rng):
    """Adversarial structure: a few very wide rows force virtual rows
    and (with enough overflow) the recursive spill plan — every exit
    must carry DF values."""
    from spalinalg_tpu.ops.kernels.csr_route import build_route_plan
    from spalinalg_tpu.ops.kernels.csr_route_df import route_spmv_df

    n = 2048
    rows = [np.full(1500, 3), np.full(900, 77)]
    cols = [np.sort(rng.choice(n, 1500, replace=False)),
            np.sort(rng.choice(n, 900, replace=False))]
    r_rest = rng.integers(0, n, size=6000)
    c_rest = rng.integers(0, n, size=6000)
    rows.append(r_rest)
    cols.append(c_rest)
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    order = np.lexsort((c, r))
    r, c = r[order], c[order]
    v = rng.normal(size=r.size)
    sp = ss.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    # duplicates summed by scipy; rebuild arrays from the csr
    ptr = sp.indptr.astype(np.int64)
    col = sp.indices.astype(np.int64)
    vals = sp.data.astype(np.float64)
    plan = build_route_plan(ptr, col, vals, n, n)
    x = rng.normal(size=n)
    y = np.asarray(route_spmv_df(plan, jnp.asarray(x),
                                 jnp.asarray(vals), interpret=True))
    ref = sp @ x
    scale = np.abs(sp).dot(np.abs(x)) + 1e-300
    assert (np.abs(y - ref) / scale).max() < 1e-5


def test_route_df_vjp(rng):
    from spalinalg_tpu.ops.kernels.csr_route import build_route_plan
    from spalinalg_tpu.ops.kernels.csr_route_df import route_spmv_df

    n = 512
    ptr, col, vals, sp = _random_csr(rng, n=n, row_nnz=4)
    plan = build_route_plan(ptr, col, vals, n, n)
    x = rng.normal(size=n)
    g = rng.normal(size=n)

    def f(xv, vv):
        return jnp.vdot(jnp.asarray(g),
                        route_spmv_df(plan, xv, vv, interpret=True))

    dx, dv = jax.grad(f, argnums=(0, 1))(jnp.asarray(x),
                                         jnp.asarray(vals))
    # closed form: dx = A^T g ; dvals = g[rows] * x[cols]
    np.testing.assert_allclose(np.asarray(dx), sp.T @ g, rtol=1e-10)
    rows_of = np.repeat(np.arange(n), np.diff(ptr))
    np.testing.assert_allclose(np.asarray(dv), g[rows_of] * x[col],
                               rtol=1e-10)


def test_route_df_dispatch_gate_cpu(rng):
    from spalinalg_tpu.ops import matvec as mv

    ptr, col, vals, sp = _random_csr(rng)
    csr = CsrMatrix._from_parts(
        1024, 1024, jnp.asarray(ptr, dtype=INDEX_DTYPE),
        jnp.asarray(col, dtype=INDEX_DTYPE), jnp.asarray(vals))
    x = jnp.asarray(rng.normal(size=1024))
    assert not mv._route_df_eligible(csr, x)  # cpu backend
    # and the fallback still computes the right thing in f64
    y = np.asarray(csr @ x)
    np.testing.assert_allclose(y, sp @ np.asarray(x), rtol=1e-12)
