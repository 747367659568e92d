"""Round-3 perf probes — resolve VERDICT weak items empirically on TPU.

Run one experiment per process (the tunnelled device can wedge):

    timeout 900 python tools/probe_r3.py bsr
    timeout 900 python tools/probe_r3.py gather
    ...

Results append to tools/probe_r3_results.jsonl.

Robust timing: totals for three loop lengths inside one jitted
``fori_loop``; per-iteration = median of the three pairwise slopes;
non-monotone totals are flagged. This replaces the two-point
differencing that produced BENCH_r02's impossible numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def log(rec):
    rec["ts"] = time.time()
    with open("tools/probe_r3_results.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def measure(body, x0, ks=(32, 160, 288), reps=3, seed0=1):
    """Median pairwise slope of total-time(k) for x -> normalize(body(x)).

    Returns (per_iter_seconds, diag dict)."""
    seed = [seed0]

    @partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        def it(i, xc):
            y = body(xc)
            return (y / (jnp.max(jnp.abs(y)) + 1.0)).astype(xc.dtype)
        return jax.lax.fori_loop(0, k, it, x)

    def fresh():
        seed[0] += 1
        return x0 * np.float32(1 + seed[0] * 1e-6)

    totals = {}
    for k in sorted(ks):
        _ = np.asarray(jax.device_get(loop(fresh(), k=k))).ravel()[0]  # warm
        best = None
        for _r in range(reps):
            xs = fresh()
            t0 = time.perf_counter()
            out = loop(xs, k=k)
            _ = np.asarray(jax.device_get(out)).ravel()[0]
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        totals[k] = best
    kl = sorted(ks)
    slopes = sorted(
        (totals[kl[j]] - totals[kl[i]]) / (kl[j] - kl[i])
        for i in range(len(kl)) for j in range(i + 1, len(kl))
    )
    per = slopes[len(slopes) // 2]
    monotone = all(totals[kl[i]] < totals[kl[i + 1]]
                   for i in range(len(kl) - 1))
    return per, {"totals": {str(k): round(v, 5) for k, v in totals.items()},
                 "slopes_us": [round(s * 1e6, 2) for s in slopes],
                 "monotone": monotone}


def _bench_bsr(nbr=512, dtype=np.float32):
    from spalinalg_tpu import BsrMatrix
    from spalinalg_tpu.dtypes import INDEX_DTYPE

    bs = 128
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
        jnp.asarray(data))
    if dtype == jnp.bfloat16:
        bsr = bsr.astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    return bsr, x0, nblocks * bs * bs


def exp_bsr():
    """Direct _stream_call_v3 vs `bsr @ v` dispatch, f32, two sizes."""
    import spalinalg_tpu.ops.kernels.bsr_stream as bs

    for nbr in (512, 1024):
        bsr, x0, nnz = _bench_bsr(nbr)
        ip, ic, data = bsr.indptr, bsr.indices, bsr.data
        n = bsr.nrows

        def direct(v):
            return bs._stream_call_v3(
                ip, ic, data, v, interpret=False, group=16
            ).reshape(-1)[:n]

        per_d, diag_d = measure(direct, x0)
        per_m, diag_m = measure(lambda v: bsr @ v, x0)
        log({"exp": "bsr", "nbr": nbr, "nnz": nnz,
             "direct_gnnz_s": round(nnz / per_d / 1e9, 2),
             "dispatch_gnnz_s": round(nnz / per_m / 1e9, 2),
             "direct": diag_d, "dispatch": diag_m})


def exp_bf16():
    """bf16 v3 kernel (2-D rhs fix) through dispatch."""
    bsr, x0, nnz = _bench_bsr(512, jnp.bfloat16)
    per, diag = measure(lambda v: bsr @ v, x0)
    log({"exp": "bf16", "nnz": nnz,
         "gnnz_s": round(nnz / per / 1e9, 2), "diag": diag})


def exp_gather():
    """Constant-index gather shapes: 1-D stream vs 2-D (R,128)/(R,512)."""
    rng = np.random.default_rng(0)
    nt = 1 << 21           # gathered elements
    nv = 1 << 17           # table size
    idx = rng.integers(0, nv, size=nt).astype(np.int32)
    tbl0 = jnp.asarray(rng.normal(size=nv).astype(np.float32))

    variants = {
        "flat": jnp.asarray(idx),
        "r128": jnp.asarray(idx.reshape(-1, 128)),
        "r512": jnp.asarray(idx.reshape(-1, 512)),
        "sq": jnp.asarray(idx.reshape(1024, -1)),
    }
    for name, ix in variants.items():
        def body(t, ix=ix):
            g = t[ix]
            # keep the carrier shape (nv,); depend on every element of g
            return t * (1.0 + jnp.sum(g) * 1e-12)

        per, diag = measure(body, tbl0)
        log({"exp": "gather", "variant": name, "n": nt,
             "gelem_s": round(nt / per / 1e9, 3), "diag": diag})
    # sorted monotone indices (the SpGEMM a-side expand pattern)
    sidx = np.sort(idx)
    for name, ix in {"flat_sorted": jnp.asarray(sidx),
                     "r128_sorted": jnp.asarray(sidx.reshape(-1, 128))}.items():
        def body(t, ix=ix):
            g = t[ix]
            return t * (1.0 + jnp.sum(g) * 1e-12)

        per, diag = measure(body, tbl0)
        log({"exp": "gather", "variant": name, "n": nt,
             "gelem_s": round(nt / per / 1e9, 3), "diag": diag})


def _bench_csr(n=1 << 16, row_nnz=32):
    from spalinalg_tpu import CsrMatrix
    from spalinalg_tpu.dtypes import INDEX_DTYPE

    rng = np.random.default_rng(0)
    colind = np.sort(rng.integers(0, n, size=(n, row_nnz)), axis=1)
    rowptr = np.arange(n + 1, dtype=np.int64) * row_nnz
    values = rng.normal(size=n * row_nnz).astype(np.float32)
    csr = CsrMatrix._from_parts(
        n, n,
        jnp.asarray(rowptr, dtype=INDEX_DTYPE),
        jnp.asarray(colind.reshape(-1), dtype=INDEX_DTYPE),
        jnp.asarray(values))
    x0 = jnp.asarray(rng.normal(size=n).astype(np.float32))
    return csr, x0, n * row_nnz


def exp_csr(which="bucket,route,seg", ks=(8, 40, 72)):
    """Routed kernel vs bucketed plan vs segment_sum on the bench case."""
    from spalinalg_tpu.ops import matvec as mv
    from spalinalg_tpu.ops.kernels.csr_route import route_spmv

    csr, x0, nnz = _bench_csr()
    which = which.split(",")

    if "bucket" in which:
        print("building bucket plan...", flush=True)
        plan = mv._row_plan(csr)
        print("measuring bucket...", flush=True)
        per_p, diag_p = measure(
            lambda v: mv._plan_spmv_jit(plan, csr.colind, csr.values, v),
            x0, ks=ks)
        log({"exp": "csr", "path": "bucket_plan", "nnz": nnz,
             "gnnz_s": round(nnz / per_p / 1e9, 3), "diag": diag_p})

    if "route" in which:
        print("building route plan...", flush=True)
        t0 = time.perf_counter()
        rp = mv._route_plan(csr)
        print(f"route plan built in {time.perf_counter()-t0:.1f}s",
              flush=True)
        if rp is not None:
            per_r, diag_r = measure(
                lambda v: route_spmv(rp, v, csr.values), x0, ks=ks)
            log({"exp": "csr", "path": "route", "nnz": nnz,
                 "K": rp.K, "T": rp.T, "S": rp.S,
                 "spill_frac": round(rp.spill_frac, 4),
                 "gnnz_s": round(nnz / per_r / 1e9, 3), "diag": diag_r})
        else:
            log({"exp": "csr", "path": "route", "note": "plan is None"})

    if "seg" in which:
        per_s, diag_s = measure(
            lambda v: mv._csr_spmv_kernel(csr.rowptr, csr.colind,
                                          csr.values, v, nrows=csr.nrows),
            x0, ks=ks)
        log({"exp": "csr", "path": "segment_sum", "nnz": nnz,
             "gnnz_s": round(nnz / per_s / 1e9, 3), "diag": diag_s})


def exp_spmm():
    """SpMM decomposition: where do the 7.7 ms go?"""
    from spalinalg_tpu.ops import matvec as mv
    from spalinalg_tpu.ops.reduction import segment_reduce

    n, K = 1 << 14, 64
    csr, _, nnz = _bench_csr(n=n)
    rng = np.random.default_rng(1)
    X0 = jnp.asarray(rng.normal(size=(n, K)).astype(np.float32))
    plan = mv._row_plan(csr)
    colind, values = csr.colind, csr.values

    def xfresh(X):
        return X

    def dep(X, out):
        # keep the loop carrier's shape; depend on every output element
        return X * (1.0 + jnp.sum(out) * 1e-12)

    # full plan path
    def full(X):
        return dep(X, mv._plan_spmm_jit(plan, colind, values, X))

    # row gather only
    def gather_only(X):
        return dep(X, X[colind, :])

    # gather+mul (no reduce)
    def gm(X):
        return dep(X, values[:, None] * X[colind, :])

    # reduce only (on a fixed prod-shaped input)
    prod0 = jnp.asarray(rng.normal(size=(nnz, K)).astype(np.float32))

    def reduce_only(P):
        return dep(P, segment_reduce(plan, P))

    # routed SpMM kernel (VERDICT r2 item 6)
    rp = mv._route_plan(csr)

    def routed(X):
        from spalinalg_tpu.ops.kernels.csr_route import route_spmm

        return dep(X, route_spmm(rp, X, values))

    cases = [("routed", routed, X0)] if rp is not None else []
    cases += [("full", full, X0), ("gather", gather_only, X0),
              ("gather_mul", gm, X0), ("reduce", reduce_only, prod0)]
    for name, body, x0 in cases:
        per, diag = measure(body, x0, ks=(8, 40, 72))
        log({"exp": "spmm", "part": name, "nnz": nnz, "K": K,
             "ms": round(per * 1e3, 3),
             "gflop_s": round(2 * nnz * K / per / 1e9, 2), "diag": diag})


def exp_spgemm():
    """SpGEMM numeric: pair-route kernel vs XLA fallback."""
    from spalinalg_tpu import CsrMatrix
    from spalinalg_tpu.dtypes import INDEX_DTYPE
    from spalinalg_tpu.ops.spgemm import spgemm_plan, _spgemm_numeric
    from spalinalg_tpu.ops.kernels.pair_route import (build_pair_route_plan,
                                                      pair_route_apply)

    n = 1 << 15
    rng = np.random.default_rng(1)
    deg = np.minimum(rng.zipf(1.8, size=n), 512)
    rowptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    nnz = int(rowptr[-1])
    colind = rng.integers(0, n, size=nnz)
    order = np.repeat(np.arange(n), deg)
    srt = np.lexsort((colind, order))
    colind = colind[srt]
    values = rng.normal(size=nnz).astype(np.float32)
    a = CsrMatrix._from_parts(
        n, n, jnp.asarray(rowptr, dtype=INDEX_DTYPE),
        jnp.asarray(colind, dtype=INDEX_DTYPE), jnp.asarray(values))
    t0 = time.perf_counter()
    plan = spgemm_plan(a, a)
    t_plan = time.perf_counter() - t0
    n_terms = int(plan.a_idx.shape[0])
    log({"exp": "spgemm", "part": "plan", "nnz_a": nnz,
         "n_terms": n_terms, "n_out": plan.n_out,
         "plan_s": round(t_plan, 2)})

    # pair-route kernel (VERDICT r2 item 1)
    t0 = time.perf_counter()
    pr = build_pair_route_plan(
        np.asarray(plan.gid, np.int64), np.asarray(plan.a_idx, np.int64),
        np.asarray(plan.b_idx, np.int64), max(plan.n_out, 1), nnz, nnz)
    t_pr = time.perf_counter() - t0
    log({"exp": "spgemm", "part": "pair_plan", "n_terms": n_terms,
         "K": pr.K, "T": pr.T, "S": pr.S,
         "spill_frac": round(pr.spill_frac, 5),
         "table_mb": round(pr.table_bytes / 1e6, 1),
         "build_s": round(t_pr, 2)})
    av0 = a.values

    # tables threaded as jit ARGUMENTS (closure constants of this size
    # break the remote-compile transport: HTTP 413)
    @partial(jax.jit, static_argnames=("k",))
    def sploop(FPA, FPB, av, k):
        def it(i, acar):
            y = pair_route_apply(pr, acar, av0, tables=(FPA, FPB))
            return acar * (1.0 + jnp.sum(y) * 1e-12)
        return jax.lax.fori_loop(0, k, it, av)

    def timed(k):
        _ = float(sploop(pr.FPA, pr.FPB,
                         av0 * np.float32(1 + next_seed()), k=k)[0])
        best = None
        for _r in range(3):
            xs = av0 * np.float32(1 + next_seed())
            t0 = time.perf_counter()
            _ = float(sploop(pr.FPA, pr.FPB, xs, k=k)[0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    seedc = [100]

    def next_seed():
        seedc[0] += 1
        return seedc[0] * 1e-6

    totals = {k: timed(k) for k in (8, 40, 72)}
    kl = sorted(totals)
    slopes = sorted((totals[kl[j]] - totals[kl[i]]) / (kl[j] - kl[i])
                    for i in range(3) for j in range(i + 1, 3))
    per2 = slopes[1]
    log({"exp": "spgemm", "part": "pair_route", "n_terms": n_terms,
         "nvr": int(pr.vrow_src.size),
         "totals": {str(k): round(v, 4) for k, v in totals.items()},
         "ms": round(per2 * 1e3, 3),
         "gterms_s": round(n_terms / per2 / 1e9, 4)})

    # kernel-only (no vrow/spill tails): isolates the XLA tail cost
    from spalinalg_tpu.ops.kernels.pair_route import _pair_call

    @partial(jax.jit, static_argnames=("k",))
    def kloop(FPA, FPB, av, k):
        def it(i, acar):
            y = _pair_call(FPA, FPB, pr.has_a, pr.has_b, acar, av0,
                           K=pr.K, R=pr.R, T=pr.T, S=pr.S, RPP=pr.RPP,
                           nnz_a=pr.nnz_a, nnz_b=pr.nnz_b)
            return acar * (1.0 + jnp.sum(y) * 1e-12)
        return jax.lax.fori_loop(0, k, it, av)

    def ktimed(k):
        _ = float(kloop(pr.FPA, pr.FPB,
                        av0 * np.float32(1 + next_seed()), k=k)[0])
        best = None
        for _r in range(3):
            xs = av0 * np.float32(1 + next_seed())
            t0 = time.perf_counter()
            _ = float(kloop(pr.FPA, pr.FPB, xs, k=k)[0])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    ktot = {k: ktimed(k) for k in (8, 40, 72)}
    ks_ = sorted(ktot)
    kslopes = sorted((ktot[ks_[j]] - ktot[ks_[i]]) / (ks_[j] - ks_[i])
                     for i in range(3) for j in range(i + 1, 3))
    perk = kslopes[1]
    log({"exp": "spgemm", "part": "pair_kernel_only",
         "n_terms": n_terms,
         "totals": {str(k): round(v, 4) for k, v in ktot.items()},
         "ms": round(perk * 1e3, 3),
         "gterms_s": round(n_terms / perk / 1e9, 4)})

    # current fallback (1-D) — single timed call, it is known-slow
    av = a.values * np.float32(1.000001)
    out = _spgemm_numeric(plan.a_idx, plan.b_idx, plan.gid, av, av,
                          n_out=plan.n_out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = _spgemm_numeric(plan.a_idx, plan.b_idx, plan.gid,
                          av * np.float32(1.000001), av, n_out=plan.n_out)
    jax.block_until_ready(out)
    t1 = time.perf_counter() - t0
    log({"exp": "spgemm", "part": "numeric1d_single", "n_terms": n_terms,
         "ms": round(t1 * 1e3, 1),
         "gterms_s": round(n_terms / t1 / 1e9, 5)})


def exp_ship():
    """H2D transfer rate through the relay (sizes that matter)."""
    for mb in (8, 32, 128):
        x = np.random.default_rng(0).integers(
            0, 100, size=mb * 1024 * 1024 // 4).astype(np.int32)
        t0 = time.perf_counter()
        d = jnp.asarray(x)
        jax.block_until_ready(d)
        dt = time.perf_counter() - t0
        log({"exp": "ship", "mb": mb, "s": round(dt, 2),
             "mb_s": round(mb / dt, 2)})
        del d


def exp_scatter():
    """Sorted-index scatter-add: the SpGEMM tail primitive."""
    rng = np.random.default_rng(0)
    n_out = 1 << 21
    for nv in (1 << 15, 1 << 17):
        idx = np.sort(rng.integers(0, n_out, size=nv)).astype(np.int32)
        vals0 = jnp.asarray(rng.normal(size=nv).astype(np.float32))
        base0 = jnp.asarray(rng.normal(size=n_out).astype(np.float32))
        ji = jnp.asarray(idx)

        def body(v, base0=base0, ji=ji):
            y = base0.at[ji].add(v, indices_are_sorted=True)
            return v * (1.0 + jnp.sum(y) * 1e-12)

        per, diag = measure(body, vals0, ks=(8, 40, 72))
        log({"exp": "scatter", "nv": nv, "ms": round(per * 1e3, 3),
             "gelem_s": round(nv / per / 1e9, 4), "diag": diag})


EXPS = {"bsr": exp_bsr, "bf16": exp_bf16, "gather": exp_gather,
        "csr": exp_csr, "spmm": exp_spmm, "spgemm": exp_spgemm,
        "ship": exp_ship, "scatter": exp_scatter}


def main():
    sel = sys.argv[1:] or list(EXPS)
    for name in sel:
        if ":" in name:
            base, arg = name.split(":", 1)
            EXPS[base](arg)
        else:
            EXPS[name]()


if __name__ == "__main__":
    main()
