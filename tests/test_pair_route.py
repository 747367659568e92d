"""Paired routed-gather SpGEMM numeric kernel (VERDICT r2 item 1).

Checks the host-built pair plan + NumPy simulator + interpret-mode
Pallas kernel against the XLA reference numeric phase on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spalinalg_tpu import CsrMatrix
from spalinalg_tpu.dtypes import INDEX_DTYPE
from spalinalg_tpu.ops.kernels.pair_route import (
    build_pair_route_plan, pair_route_apply, simulate_pair_route)
from spalinalg_tpu.ops.spgemm import _spgemm_numeric, spgemm_plan


def _mat(n, deg_fn, seed):
    rng = np.random.default_rng(seed)
    deg = deg_fn(rng, n)
    rowptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    nnz = int(rowptr[-1])
    colind = rng.integers(0, n, size=nnz)
    order = np.repeat(np.arange(n), deg)
    srt = np.lexsort((colind, order))
    colind = colind[srt]
    values = rng.normal(size=nnz).astype(np.float32)
    return CsrMatrix._from_parts(
        n, n,
        jnp.asarray(rowptr, dtype=INDEX_DTYPE),
        jnp.asarray(colind, dtype=INDEX_DTYPE),
        jnp.asarray(values))


def _plan_pair(a, b):
    plan = spgemm_plan(a, b)
    nnz_a = int(np.asarray(a._ptr)[-1])
    nnz_b = int(np.asarray(b._ptr)[-1])
    pr = build_pair_route_plan(
        np.asarray(plan.gid, np.int64), np.asarray(plan.a_idx, np.int64),
        np.asarray(plan.b_idx, np.int64), max(plan.n_out, 1),
        max(nnz_a, 1), max(nnz_b, 1))
    return plan, pr


def _oracle(plan, av, bv):
    return np.asarray(_spgemm_numeric(
        plan.a_idx, plan.b_idx, plan.gid, jnp.asarray(av), jnp.asarray(bv),
        n_out=plan.n_out))


class TestPairRoutePlan:
    @pytest.mark.parametrize("n,seed", [(64, 0), (200, 1), (500, 2)])
    def test_simulator_matches_oracle(self, n, seed):
        a = _mat(n, lambda r, n: np.minimum(r.zipf(1.9, size=n), 64), seed)
        b = _mat(n, lambda r, n: r.integers(1, 6, size=n), seed + 10)
        plan, pr = _plan_pair(a, b)
        av = np.asarray(a.values)
        bv = np.asarray(b.values)
        got = simulate_pair_route(pr, av, bv)
        # add the spill contribution the simulator leaves out
        sp_g, sp_a, sp_b = pr.spill
        np.add.at(got, sp_g, av[sp_a] * bv[sp_b])
        np.testing.assert_allclose(got, _oracle(plan, av, bv),
                                   rtol=1e-5, atol=1e-5)
        assert pr.spill_frac < 0.05

    def test_interpret_kernel_matches_oracle(self):
        n = 150
        a = _mat(n, lambda r, n: r.integers(1, 9, size=n), 3)
        plan, pr = _plan_pair(a, a)
        av = np.asarray(a.values)
        got = np.asarray(pair_route_apply(pr, jnp.asarray(av),
                                          jnp.asarray(av), interpret=True))
        np.testing.assert_allclose(got, _oracle(plan, av, av),
                                   rtol=1e-5, atol=1e-5)

    def test_fresh_values_reuse_plan(self):
        n = 120
        a = _mat(n, lambda r, n: r.integers(1, 7, size=n), 4)
        plan, pr = _plan_pair(a, a)
        av = np.asarray(a.values)
        for scale in (1.0, -2.5):
            got = np.asarray(pair_route_apply(
                pr, jnp.asarray(av * scale), jnp.asarray(av),
                interpret=True))
            np.testing.assert_allclose(got, _oracle(plan, av * scale, av),
                                       rtol=1e-5, atol=1e-5)

    def test_wide_output_rows_use_virtual_rows(self):
        # one output slot with many terms: x.T @ x-like concentration
        n = 96
        rng = np.random.default_rng(5)
        # single dense column -> output (0,0) accumulates n terms
        rowptr = np.arange(n + 1, dtype=np.int64)
        colind = np.zeros(n, dtype=np.int64)
        vals = rng.normal(size=n).astype(np.float32)
        a = CsrMatrix._from_parts(
            n, n, jnp.asarray(rowptr, dtype=INDEX_DTYPE),
            jnp.asarray(colind, dtype=INDEX_DTYPE), jnp.asarray(vals))
        at = CsrMatrix._from_parts(
            n, n,
            jnp.asarray(np.concatenate([[0], np.full(n, n)]),
                        dtype=INDEX_DTYPE),
            jnp.asarray(np.arange(n), dtype=INDEX_DTYPE),
            jnp.asarray(vals))
        plan, pr = _plan_pair(at, a)
        got = simulate_pair_route(pr, vals, vals)
        sp_g, sp_a, sp_b = pr.spill
        np.add.at(got, sp_g, vals[sp_a] * vals[sp_b])
        np.testing.assert_allclose(got, _oracle(plan, vals, vals),
                                   rtol=1e-4, atol=1e-4)


class TestSliceGrouping:
    def test_forced_group_matches_oracle(self, monkeypatch):
        """r5b: G source slices share one page; the slice-select bits
        (25-27) pick the gathered plane per stage-1 slot. Forced G=2
        with a 2-slice operand exercises w>0 entries end to end."""
        monkeypatch.setenv("SPALINALG_PAIR_GROUP", "2")
        n = 420
        a = _mat(n, lambda r, n: r.integers(40, 46, size=n), 6)
        b = _mat(n, lambda r, n: r.integers(1, 4, size=n), 7)
        plan, pr = _plan_pair(a, b)
        assert pr.Ga == 2 and pr.Gb == 2
        assert pr.S >= 2  # route a really spans two source slices
        av = np.asarray(a.values)
        bv = np.asarray(b.values)
        got = simulate_pair_route(pr, av, bv)
        sp_g, sp_a, sp_b = pr.spill
        np.add.at(got, sp_g, av[sp_a] * bv[sp_b])
        np.testing.assert_allclose(got, _oracle(plan, av, bv),
                                   rtol=1e-4, atol=1e-4)
        got_k = np.asarray(pair_route_apply(
            pr, jnp.asarray(av), jnp.asarray(bv), interpret=True))
        np.testing.assert_allclose(got_k, _oracle(plan, av, bv),
                                   rtol=1e-4, atol=1e-4)


class TestRetryRounds:
    def test_forced_coloring_retries_stay_exact(self):
        """A structure that overloads single source rows (every output
        row multiplies against one hot B row) forces first-round
        coloring failures; the retry rounds must route them exactly
        (no silent spill-path divergence)."""
        n, hot = 256, 192
        rng = np.random.default_rng(8)
        # A: each row has one entry in column 0
        a = CsrMatrix._from_parts(
            n, n,
            jnp.asarray(np.arange(n + 1), dtype=INDEX_DTYPE),
            jnp.asarray(np.zeros(n, np.int64), dtype=INDEX_DTYPE),
            jnp.asarray(rng.normal(size=n).astype(np.float32)))
        # B: row 0 holds `hot` entries; other rows empty
        bptr = np.zeros(n + 1, np.int64)
        bptr[1:] = hot
        b = CsrMatrix._from_parts(
            n, n,
            jnp.asarray(bptr, dtype=INDEX_DTYPE),
            jnp.asarray(np.arange(hot), dtype=INDEX_DTYPE),
            jnp.asarray(rng.normal(size=hot).astype(np.float32)))
        plan, pr = _plan_pair(a, b)
        av = np.asarray(a.values)
        bv = np.asarray(b.values)
        got = simulate_pair_route(pr, av, bv)
        sp_g, sp_a, sp_b = pr.spill
        np.add.at(got, sp_g, av[sp_a] * bv[sp_b])
        np.testing.assert_allclose(got, _oracle(plan, av, bv),
                                   rtol=1e-5, atol=1e-5)
        # the interpret kernel agrees too (flags + retry pages)
        got_k = np.asarray(pair_route_apply(
            pr, jnp.asarray(av), jnp.asarray(bv), interpret=True))
        np.testing.assert_allclose(got_k, _oracle(plan, av, bv),
                                   rtol=1e-5, atol=1e-5)
