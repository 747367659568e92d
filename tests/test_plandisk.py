"""On-disk plan persistence (`utils/plandisk.py`).

ADVICE r4 medium: the store must be a NON-EXECUTABLE format (the old
pickle path executed arbitrary code from a shared/tampered cache dir),
keyed on structure only, with a size cap + LRU eviction.
"""

import os
import zipfile

import numpy as np
import pytest

import jax.numpy as jnp

from spalinalg_tpu.utils import plandisk


def _random_csr_arrays(rng, n=512, row_nnz=8):
    colind = np.sort(rng.integers(0, n, size=(n, row_nnz)), axis=1)
    rowptr = np.arange(n + 1, dtype=np.int64) * row_nnz
    values = rng.normal(size=n * row_nnz).astype(np.float32)
    return rowptr, colind.reshape(-1).astype(np.int64), values


def test_route_plan_npz_roundtrip(rng, tmp_path):
    from spalinalg_tpu.ops.kernels.csr_route import (build_route_plan,
                                                     simulate_route)

    ptr, col, vals = _random_csr_arrays(rng)
    plan = build_route_plan(ptr, col, vals, 512, 512)
    x = rng.normal(size=512).astype(np.float32)
    ref = simulate_route(plan, x)

    path = str(tmp_path / "plan.npz")
    host = plandisk._to_host(plan, ("FP",), ("spill_plan",))
    plandisk._save(path, host)
    # the file is a plain npz zip archive, not a pickle
    assert zipfile.is_zipfile(path)
    with np.load(path, allow_pickle=False) as z:
        assert "__meta__" in z.files

    back = plandisk._load(path)
    back = plandisk._to_device(back, ("FP",), ("spill_plan",))
    assert back.K == plan.K and back.T == plan.T and back.S == plan.S
    # values are NOT persisted (structure-only store)
    assert back.default_values is None
    got = simulate_route(back, x, values=vals)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_pair_plan_npz_roundtrip(rng, tmp_path):
    from spalinalg_tpu.ops.kernels.pair_route import build_pair_route_plan

    n_terms = 4096
    gid = np.sort(rng.integers(0, 512, size=n_terms))
    ai = rng.integers(0, 2048, size=n_terms)
    bi = rng.integers(0, 2048, size=n_terms)
    plan = build_pair_route_plan(gid, ai, bi, 512, 2048, 2048)
    path = str(tmp_path / "pair.npz")
    host = plandisk._to_host(plan, ("FPP",), ())
    plandisk._save(path, host)
    back = plandisk._load(path)
    assert back.n_terms == plan.n_terms
    assert back.K == plan.K and back.T == plan.T
    assert len(back.retry) == len(plan.retry)
    for (s0, g0), (s1, g1) in zip(plan.retry, back.retry):
        assert s0 == s1
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    for f in ("FPP", "page_slice_a", "page_slice_b", "page_route",
              "page_t", "page_first", "page_last"):
        np.testing.assert_array_equal(np.asarray(getattr(plan, f)),
                                      np.asarray(getattr(back, f)))


def test_load_or_build_uses_cache_and_updates_mtime(rng, tmp_path,
                                                    monkeypatch):
    monkeypatch.setenv("SPALINALG_PLAN_CACHE", str(tmp_path))
    calls = []

    class Tiny:
        pass

    import dataclasses

    @dataclasses.dataclass(eq=False)
    class _FakePlan:
        a: np.ndarray
        k: int

    # register the test class in the allowlist for this test only
    monkeypatch.setattr(
        plandisk, "_plan_classes",
        lambda: {"_FakePlan": _FakePlan, "RoutePlan": _FakePlan})

    def build():
        calls.append(1)
        return _FakePlan(a=np.arange(5, dtype=np.int64), k=7)

    p1 = plandisk.load_or_build("t", (np.arange(3),), (1,), build,
                                jax_fields=())
    p2 = plandisk.load_or_build("t", (np.arange(3),), (1,), build,
                                jax_fields=())
    assert len(calls) == 1  # second came from disk
    assert p2.k == 7
    np.testing.assert_array_equal(np.asarray(p2.a), np.arange(5))
    # a different structure key rebuilds
    plandisk.load_or_build("t", (np.arange(4),), (1,), build,
                           jax_fields=())
    assert len(calls) == 2


def test_supernodal_symbolic_roundtrip(rng, tmp_path, monkeypatch):
    """(perm, SupernodalPlan) persists through the npz store and the
    reloaded plan factors to the same panels (VERDICT r4 #6)."""
    monkeypatch.setenv("SPALINALG_PLAN_CACHE", str(tmp_path))
    import jax

    from spalinalg_tpu import CsrMatrix
    from spalinalg_tpu.dtypes import INDEX_DTYPE
    from spalinalg_tpu.linalg.cholesky import cholesky, cholesky_solve

    k = 12
    n = k * k
    rows, cols, vals = [], [], []
    for i in range(k):
        for j in range(k):
            r = i * k + j
            for (ii, jj, v) in ((i, j, 4.0), (i - 1, j, -1.0),
                                (i + 1, j, -1.0), (i, j - 1, -1.0),
                                (i, j + 1, -1.0)):
                if 0 <= ii < k and 0 <= jj < k:
                    rows.append(r)
                    cols.append(ii * k + jj)
                    vals.append(v)
    order = np.lexsort((cols, rows))
    rows = np.asarray(rows)[order]
    cols = np.asarray(cols)[order]
    vals = np.asarray(vals, np.float32)[order]
    rowptr = np.zeros(n + 1, np.int64)
    np.add.at(rowptr, rows + 1, 1)
    np.cumsum(rowptr, out=rowptr)
    csr = CsrMatrix._from_parts(
        n, n, jnp.asarray(rowptr, dtype=INDEX_DTYPE),
        jnp.asarray(cols, dtype=INDEX_DTYPE), jnp.asarray(vals))
    b = jnp.asarray(rng.normal(size=n).astype(np.float32))

    fac1 = cholesky(csr, method="supernodal")
    x1 = np.asarray(cholesky_solve(fac1, b))
    assert len(list(tmp_path.iterdir())) == 1  # plan stored
    # second factor comes from the disk plan; same result
    fac2 = cholesky(csr, method="supernodal")
    x2 = np.asarray(cholesky_solve(fac2, b))
    np.testing.assert_allclose(x1, x2, rtol=1e-6)
    res = np.asarray(csr @ jnp.asarray(x2)) - np.asarray(b)
    assert np.abs(res).max() < 1e-4


def test_eviction_caps_cache_size(tmp_path, monkeypatch):
    monkeypatch.setenv("SPALINALG_PLAN_CACHE_MAX_MB", "1")
    # write 5 x ~400 KB files with increasing mtimes
    for i in range(5):
        p = tmp_path / f"f{i}.npz"
        p.write_bytes(bytes(400_000))
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    plandisk._evict(str(tmp_path))
    left = sorted(f.name for f in tmp_path.iterdir())
    total = sum(f.stat().st_size for f in tmp_path.iterdir())
    assert total <= 1_000_000
    # oldest went first
    assert "f0.npz" not in left and "f4.npz" in left


def test_corrupt_cache_falls_back_to_rebuild(tmp_path, monkeypatch):
    monkeypatch.setenv("SPALINALG_PLAN_CACHE", str(tmp_path))
    import dataclasses

    @dataclasses.dataclass(eq=False)
    class _FakePlan:
        k: int

    monkeypatch.setattr(plandisk, "_plan_classes",
                        lambda: {"_FakePlan": _FakePlan})
    calls = []

    def build():
        calls.append(1)
        return _FakePlan(k=3)

    plandisk.load_or_build("c", (), (9,), build, jax_fields=())
    # corrupt the stored file
    (fname,) = [f for f in tmp_path.iterdir()]
    fname.write_bytes(b"not an npz")
    p = plandisk.load_or_build("c", (), (9,), build, jax_fields=())
    assert p.k == 3 and len(calls) == 2
