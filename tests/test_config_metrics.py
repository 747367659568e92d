"""Config and metrics tiers are consumed by dispatch (VERDICT r1 item 5:
every exported subsystem must have a consumer, and a test must prove each
knob changes behavior)."""

import numpy as np
import pytest
import scipy.sparse as sps

import jax
import jax.numpy as jnp

from spalinalg_tpu import CsrMatrix
from spalinalg_tpu import config as cfg_mod
from spalinalg_tpu.dtypes import INDEX_DTYPE
from spalinalg_tpu.utils import metrics


def _csr(n=300, density=0.03, seed=7, dtype=np.float32):
    A = sps.random(n, n, density, random_state=seed).tocsr()
    A.sort_indices()
    return A, CsrMatrix._from_parts(
        n, n,
        jnp.asarray(A.indptr, dtype=INDEX_DTYPE),
        jnp.asarray(A.indices, dtype=INDEX_DTYPE),
        jnp.asarray(A.data.astype(dtype)))


class TestConfigConsumed:
    def test_bucket_widths_change_row_plan(self):
        from spalinalg_tpu.ops import matvec as mv

        _, csr = _csr()
        mv._ROW_PLAN_CACHE.clear()
        base = cfg_mod.current_config()
        with cfg_mod.use(base.with_(max_bucket_width=8, min_bucket_width=8)):
            p8 = mv._row_plan(csr)
        with cfg_mod.use(base.with_(max_bucket_width=512, min_bucket_width=4)):
            p512 = mv._row_plan(csr)
        w8 = {w for w, _ in p8.levels[0].buckets}
        w512 = {w for w, _ in p512.levels[0].buckets}
        assert max(w8) <= 8
        assert w8 != w512
        # both plans still reduce correctly
        x = np.ones(csr.nse, np.float32)
        from spalinalg_tpu.ops.reduction import segment_reduce
        out8 = np.asarray(segment_reduce(p8, jnp.asarray(x)))
        out512 = np.asarray(segment_reduce(p512, jnp.asarray(x)))
        np.testing.assert_allclose(out8, out512)

    def test_use_pallas_gates_route_dispatch(self):
        from spalinalg_tpu.ops import matvec as mv

        _, csr = _csr(n=2048, density=0.01)
        x = jnp.ones(2048, jnp.float32)
        base = cfg_mod.current_config()
        with cfg_mod.use(base.with_(use_pallas=False)):
            assert not mv._route_eligible(csr, x)

    def test_partition_axis_names_mesh(self):
        from spalinalg_tpu.parallel.partition import make_row_mesh

        base = cfg_mod.current_config()
        with cfg_mod.use(base.with_(partition_axis="shards")):
            mesh = make_row_mesh(2)
        assert mesh.axis_names == ("shards",)

    def test_use_is_scoped(self):
        base = cfg_mod.current_config()
        with cfg_mod.use(base.with_(use_pallas=False)):
            assert not cfg_mod.current_config().use_pallas
        assert cfg_mod.current_config().use_pallas == base.use_pallas


class TestMetricsConsumed:
    def test_spmv_records(self):
        A, csr = _csr()
        x = jnp.ones(300, jnp.float32)
        rec = metrics.enable()
        try:
            n0 = len(rec.records)
            _ = jax.block_until_ready(csr @ x)
            assert len(rec.records) == n0 + 1
            m = rec.records[-1]
            assert m.op == "csr_spmv"
            assert m.nnz == csr.nse
            assert m.seconds > 0
            assert m.nnz_per_s > 0
        finally:
            metrics.disable()

    def test_spgemm_records(self):
        _, a = _csr(seed=1)
        _, b = _csr(seed=2)
        rec = metrics.enable()
        try:
            n0 = len(rec.records)
            _ = a * b
            ops = [m.op for m in rec.records[n0:]]
            assert "spgemm" in ops
        finally:
            metrics.disable()

    def test_csc_mirror_records_once(self):
        from spalinalg_tpu.convert.conversions import csr_to_csc

        _, a = _csr(seed=3)
        csc = csr_to_csc(a)
        rec = metrics.enable()
        try:
            n0 = len(rec.records)
            _ = jax.block_until_ready(csc @ jnp.ones(300, jnp.float32))
            new = rec.records[n0:]
            assert [m.op for m in new] == ["csc_spmv"]
        finally:
            metrics.disable()

    def test_disabled_recorder_records_nothing(self):
        _, csr = _csr(seed=4)
        rec = metrics.recorder()
        n0 = len(rec.records)
        _ = jax.block_until_ready(csr @ jnp.ones(300, jnp.float32))
        assert len(rec.records) == n0


class TestNativeLevelSchedule:
    def test_native_matches_python(self):
        from spalinalg_tpu.linalg.ordering import level_schedule
        from spalinalg_tpu.native import lib as native

        if not native.available():
            pytest.skip("native library unavailable")
        n = 5000  # above the native-dispatch threshold
        A = sps.random(n, n, 0.001, random_state=5).tocsr()
        L = sps.tril(A, k=-1).tocsr() + sps.eye(n, format="csr")
        L.sort_indices()
        ptr, ind = L.indptr.astype(np.int64), L.indices.astype(np.int64)
        b_native, o_native = level_schedule(ptr, ind, n, lower=True)

        # pure-python reference (force the fallback)
        lev = np.zeros(n, dtype=np.int64)
        for i in range(n):
            deps = ind[ptr[i]:ptr[i + 1]]
            deps = deps[deps < i]
            if deps.size:
                lev[i] = lev[deps].max() + 1
        nl = int(lev.max()) + 1
        order = np.argsort(lev, kind="stable")
        bounds = np.searchsorted(lev[order], np.arange(nl + 1))
        np.testing.assert_array_equal(b_native, bounds)
        np.testing.assert_array_equal(o_native, order)


class TestBsrStreamGroupKnob:
    def test_group_consulted_and_correct(self, rng):
        """Config.bsr_stream_group reaches the v3 kernel and the result
        stays oracle-exact at a non-default window size."""
        import jax.numpy as jnp

        import spalinalg_tpu.config as cfg_mod
        import spalinalg_tpu.ops.kernels.bsr_stream as bs
        from spalinalg_tpu.dtypes import INDEX_DTYPE

        bsz, nbr = 8, 6
        n = bsz * nbr
        indptr = [0]
        indices = []
        for i in range(nbr):
            cols = [j for j in (i - 1, i, i + 1) if 0 <= j < nbr]
            indices.extend(cols)
            indptr.append(len(indices))
        data = rng.normal(size=(len(indices), bsz, bsz)).astype(np.float32)
        x = rng.normal(size=n).astype(np.float32)

        dense = np.zeros((n, n), np.float32)
        k = 0
        for i in range(nbr):
            for j in indices[indptr[i]:indptr[i + 1]]:
                dense[i*bsz:(i+1)*bsz, j*bsz:(j+1)*bsz] = data[k]
                k += 1

        base = cfg_mod.current_config()
        with cfg_mod.use(base.with_(bsr_stream_group=4)):
            y = bs._stream_call_v3(
                jnp.asarray(indptr, INDEX_DTYPE),
                jnp.asarray(indices, INDEX_DTYPE),
                jnp.asarray(data), jnp.asarray(x),
                interpret=True).reshape(-1)[:n]
            assert bs._LAST_V3_GROUP == 4
        np.testing.assert_allclose(np.asarray(y), dense @ x,
                                   rtol=1e-5, atol=1e-4)
        # default path falls back to the measured module constant
        y2 = bs._stream_call_v3(
            jnp.asarray(indptr, INDEX_DTYPE),
            jnp.asarray(indices, INDEX_DTYPE),
            jnp.asarray(data), jnp.asarray(x),
            interpret=True).reshape(-1)[:n]
        assert bs._LAST_V3_GROUP == min(bs._V3_GROUP, len(indices))
        np.testing.assert_allclose(np.asarray(y2), dense @ x,
                                   rtol=1e-5, atol=1e-4)
