"""Routed-SpMV plan + kernel tests (ops/kernels/csr_route).

The plan builder is exercised directly on scipy-style CSR arrays; the
kernel runs in interpret mode on CPU. On TPU the same plan feeds the
compiled Pallas kernel (dispatched from ops.matvec.csr_matvec).
"""

import numpy as np
import pytest
import scipy.sparse as sps

import jax.numpy as jnp

from spalinalg_tpu.ops.kernels.csr_route import (
    build_route_plan,
    route_spmv,
    simulate_route,
)


def _plan_of(A):
    A = A.tocsr()
    A.sort_indices()
    return build_route_plan(A.indptr, A.indices, A.data,
                            A.shape[0], A.shape[1])


def _check(A, rng, tol=2e-5):
    A = A.tocsr()
    A.sort_indices()
    plan = _plan_of(A)
    x = rng.normal(size=A.shape[1]).astype(np.float32)
    yref = (A @ x).astype(np.float64)
    scale = np.abs(yref).max() + 1.0

    # simulator (routed part + manual spill)
    ysim = simulate_route(plan, x).astype(np.float64)
    sr, sc, ssrc = plan.spill
    np.add.at(ysim, sr, A.data[ssrc] * x[sc])
    np.testing.assert_allclose(ysim / scale, yref / scale, atol=tol)

    # interpret-mode kernel (includes recursive spill plans)
    ypal = np.asarray(route_spmv(plan, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(ypal / scale, yref / scale, atol=tol)
    return plan


class TestRoutePlan:
    def test_random(self, rng):
        A = sps.random(700, 900, 0.02, random_state=7, dtype=np.float64)
        plan = _check(A, rng)
        assert plan.spill_frac < 0.05

    def test_uniform_rows(self, rng):
        n = 2048
        cols = np.sort(rng.integers(0, n, size=(n, 16)), axis=1)
        A = sps.csr_matrix(
            (rng.normal(size=n * 16), cols.reshape(-1),
             np.arange(n + 1) * 16), shape=(n, n))
        plan = _check(A, rng)
        assert plan.spill_frac < 0.02

    def test_banded(self, rng):
        A = sps.diags([-1.0, 4.0, -1.0], [-1, 0, 1], shape=(3000, 3000))
        plan = _check(A, rng)
        assert plan.spill_frac < 0.001

    def test_skewed_rows_virtual(self, rng):
        lens = np.minimum(rng.zipf(1.7, size=1000), 500)
        ind = [np.sort(rng.choice(1200, size=min(int(l), 1200),
                                  replace=False)) for l in lens]
        indptr = np.concatenate([[0], np.cumsum([len(i) for i in ind])])
        A = sps.csr_matrix(
            (rng.normal(size=indptr[-1]), np.concatenate(ind), indptr),
            shape=(1000, 1200))
        plan = _check(A, rng)
        # wide rows are absorbed structurally (virtual rows for the
        # widest, recursive spill plans for the binomial tail) — not
        # dumped on the XLA residual path (r4: the vrow threshold
        # moved to _HEAVY_FACTOR*K, so spill plans carry the mid tail)
        deepest = plan
        while deepest.spill_plan is not None:
            deepest = deepest.spill_plan
        assert plan.vrow_src.size > 0 or plan.spill_plan is not None
        # the XLA residual only carries what is below the recursion
        # threshold (or a bounded fraction after depth exhaustion)
        assert (deepest.spill[0].size < 1024
                or deepest.spill[0].size < 0.05 * plan.nnz)
        # r5: the top-level spill_frac counts recursively ROUTED
        # entries (overflow-to-spill economics) — the quality metric
        # is what falls through to the XLA residual path
        assert plan.xla_resid_frac < 0.02

    def test_compacted_spill_with_routed_merge(self, rng):
        """r5: spill levels with few distinct rows re-index rows
        densely and merge their partials back through one routed
        merge call (plan.merge_plan) — correctness over the whole
        compact + merge machinery. Row lengths are heavily skewed so
        overflow-to-spill still produces a recursive level now that
        the payload-reuse coloring (r5b) routes uniform structures
        without residue."""
        n, m = 4096, 32768
        lens = np.minimum(rng.zipf(1.6, size=n) * 4, 2000)
        ind = [np.sort(rng.choice(m, size=min(int(l), m), replace=False))
               for l in lens]
        indptr = np.concatenate([[0],
                                 np.cumsum([len(i) for i in ind])])
        A = sps.csr_matrix(
            (rng.normal(size=indptr[-1]), np.concatenate(ind), indptr),
            shape=(n, m))
        A.sum_duplicates()
        A.sort_indices()
        plan = _check(A, rng)
        # the structure must actually exercise the machinery
        chain_compacts = []
        p = plan.spill_plan
        while p is not None:
            if p.compact_src is not None:
                chain_compacts.append(p)
            p = p.spill_plan
        assert chain_compacts, "expected at least one compacted level"
        assert plan.merge_plan is not None
        total = sum(c.compact_src.size for c in chain_compacts)
        assert plan.merge_plan.nnz == total
        assert plan.xla_resid_frac < 0.02

    def test_hot_column_multicast(self, rng):
        A = sps.csr_matrix(
            (np.ones(800), (np.arange(800), np.zeros(800, int))),
            shape=(800, 60))
        plan = _check(A, rng)
        assert plan.spill_frac == 0.0

    def test_multi_slice(self, rng):
        # ncols > 16384 forces multiple column slices
        n, m = 600, 40000
        A = sps.random(n, m, 0.001, random_state=3, dtype=np.float64)
        plan = _check(A, rng)
        assert plan.S == 3

    def test_empty(self, rng):
        _check(sps.csr_matrix((64, 64)), rng)

    def test_duplicated_column_reads(self, rng):
        # many rows reading the same few columns (payload sharing)
        cols = rng.integers(0, 4, size=(500, 3))
        cols = np.sort(cols + np.arange(3) * 4, axis=1)  # unique per row
        A = sps.csr_matrix(
            (rng.normal(size=1500), cols.reshape(-1),
             np.arange(501) * 3), shape=(500, 16))
        _check(A, rng)

    def test_table_invariants(self, rng):
        A = sps.random(300, 300, 0.03, random_state=11)
        plan = _plan_of(A)
        for F in (plan.F1, plan.F2, plan.F3):
            f = np.asarray(F)
            assert f.min() >= 0 and f.max() < 128
        assert plan.K * plan.R == plan.H
        assert plan.RPP % 128 == 0


class TestPlanCache:
    def test_plans_stay_concrete_under_outer_trace(self, rng):
        """Regression: building a cached plan while an *outer* jit is
        tracing must not capture that trace's tracers in the cache
        (observed via the bench's fori_loop driver; fixed with
        ``jax.ensure_compile_time_eval`` in ops.matvec)."""
        import jax

        from spalinalg_tpu import CsrMatrix
        from spalinalg_tpu.dtypes import INDEX_DTYPE
        from spalinalg_tpu.ops import matvec as mv

        A = sps.random(300, 300, 0.03, random_state=13).tocsr()
        A.sort_indices()
        csr = CsrMatrix._from_parts(
            300, 300,
            jnp.asarray(A.indptr, dtype=INDEX_DTYPE),
            jnp.asarray(A.indices, dtype=INDEX_DTYPE),
            jnp.asarray(A.data.astype(np.float32)))

        mv._ROUTE_PLAN_CACHE.clear()
        mv._ROW_PLAN_CACHE.clear()
        built = {}

        def f(x):
            # build both cached plans from inside an active trace
            built["route"] = mv._route_plan(csr)
            built["row"] = mv._row_plan(csr)
            return csr @ x

        jax.make_jaxpr(f)(jnp.ones(300, jnp.float32))

        plan = built["route"]
        assert plan is not None
        for arr in (plan.FP, plan.bake(plan.default_values)):
            assert not isinstance(arr, jax.core.Tracer)
        for leaf in jax.tree_util.tree_leaves(built["row"]):
            assert not isinstance(leaf, jax.core.Tracer)

        # and the cached plan still computes correctly afterwards
        x = rng.normal(size=300).astype(np.float32)
        y = np.asarray(route_spmv(plan, jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(
            y, (A @ x).astype(np.float32), rtol=2e-4, atol=2e-5)


class TestValueUpdates:
    """Routing structure is values-independent (VERDICT r1 item 6):
    new values reuse the plan, and grads flow through ``values``."""

    def _small(self):
        A = sps.random(400, 400, 0.02, random_state=21).tocsr()
        A.sort_indices()
        return A

    def test_values_update_reuses_plan(self, rng):
        A = self._small()
        plan = build_route_plan(A.indptr, A.indices, A.data, 400, 400)
        v2 = rng.normal(size=A.nnz).astype(np.float32)
        y2 = np.asarray(route_spmv(
            plan, jnp.ones(400, jnp.float32), jnp.asarray(v2),
            interpret=True))
        A2 = sps.csr_matrix((v2, A.indices, A.indptr), shape=(400, 400))
        yref = A2 @ np.ones(400, np.float32)
        np.testing.assert_allclose(y2, yref, rtol=2e-4, atol=2e-5)

    def test_grad_through_values(self, rng):
        import jax

        A = self._small()
        plan = build_route_plan(A.indptr, A.indices, A.data, 400, 400)
        x = jnp.asarray(rng.normal(size=400).astype(np.float32))
        w = jnp.asarray(rng.normal(size=400).astype(np.float32))

        def loss(vals):
            return jnp.vdot(w, route_spmv(plan, x, vals, interpret=True))

        g = jax.grad(loss)(jnp.asarray(A.data.astype(np.float32)))
        # d/dv[e] (w . A(v) x) = w[row_e] * x[col_e]
        rows = np.repeat(np.arange(400), np.diff(A.indptr))
        gref = np.asarray(w)[rows] * np.asarray(x)[A.indices]
        np.testing.assert_allclose(np.asarray(g), gref,
                                   rtol=2e-4, atol=2e-5)


class TestDispatch:
    def test_csr_matvec_falls_back_on_cpu(self, rng):
        # on CPU backend the route path must not engage (gated); the
        # result still matches scipy through the plan path.
        from spalinalg_tpu import CsrMatrix
        from spalinalg_tpu.dtypes import INDEX_DTYPE

        A = sps.random(256, 256, 0.05, random_state=5).tocsr()
        A.sort_indices()
        csr = CsrMatrix._from_parts(
            256, 256,
            jnp.asarray(A.indptr, dtype=INDEX_DTYPE),
            jnp.asarray(A.indices, dtype=INDEX_DTYPE),
            jnp.asarray(A.data.astype(np.float32)))
        x = rng.normal(size=256).astype(np.float32)
        y = np.asarray(csr @ jnp.asarray(x))
        np.testing.assert_allclose(y, (A @ x).astype(np.float32),
                                   rtol=2e-4, atol=2e-5)


class TestRouteSpmm:
    """SpMM through the routing plan (north-star N2, VERDICT r2 item 6)."""

    def _check_mm(self, A, rng, K=8, tol=2e-5):
        from spalinalg_tpu.ops.kernels.csr_route import route_spmm

        A = A.tocsr()
        A.sort_indices()
        plan = _plan_of(A)
        X = rng.normal(size=(A.shape[1], K)).astype(np.float32)
        Yref = (A @ X).astype(np.float64)
        scale = np.abs(Yref).max() + 1.0
        Y = np.asarray(route_spmm(plan, jnp.asarray(X), interpret=True))
        np.testing.assert_allclose(Y / scale, Yref / scale, atol=tol)
        return plan

    def test_random(self, rng):
        A = sps.random(500, 400, 0.03, random_state=2, dtype=np.float64)
        self._check_mm(A, rng)

    def test_uniform_rows_k64(self, rng):
        n, row_nnz = 512, 16
        cols = rng.integers(0, n, size=(n, row_nnz))
        rows = np.repeat(np.arange(n), row_nnz)
        A = sps.csr_matrix(
            (rng.normal(size=n * row_nnz), (rows, cols.ravel())),
            shape=(n, n))
        self._check_mm(A, rng, K=64)

    def test_multi_slice(self, rng):
        A = sps.random(300, 40000, 0.001, random_state=4)
        self._check_mm(A, rng, K=4)

    def test_skewed_virtual_rows(self, rng):
        lens = np.minimum(rng.zipf(1.7, size=300), 800)
        rows = np.repeat(np.arange(300), lens)
        cols = rng.integers(0, 300, size=lens.sum())
        A = sps.csr_matrix(
            (rng.normal(size=lens.sum()), (rows, cols)), shape=(300, 300))
        self._check_mm(A, rng, K=8)

    def test_grad_through_values(self, rng):
        import jax

        from spalinalg_tpu.ops.kernels.csr_route import route_spmm

        A = sps.random(200, 150, 0.04, random_state=6).tocsr()
        A.sort_indices()
        plan = _plan_of(A)
        X = jnp.asarray(rng.normal(size=(150, 4)).astype(np.float32))
        W = jnp.asarray(rng.normal(size=(200, 4)).astype(np.float32))

        def loss(vals):
            return jnp.sum(W * route_spmm(plan, X, vals, interpret=True))

        g = jax.grad(loss)(jnp.asarray(A.data.astype(np.float32)))
        rows = np.repeat(np.arange(200), np.diff(A.indptr))
        gref = np.sum(np.asarray(W)[rows] * np.asarray(X)[A.indices],
                      axis=1)
        np.testing.assert_allclose(np.asarray(g), gref,
                                   rtol=2e-4, atol=2e-5)
