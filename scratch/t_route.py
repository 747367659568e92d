import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import scipy.sparse as sps
from spalinalg_tpu.ops.kernels.csr_route import (
    build_route_plan, simulate_route, route_spmv)

rng = np.random.default_rng(0)

def check(name, A):
    A = A.tocsr()
    A.sort_indices()
    n, m = A.shape
    x = rng.normal(size=m)
    t0 = time.perf_counter()
    plan = build_route_plan(A.indptr, A.indices, A.data, n, m)
    t1 = time.perf_counter()
    yref = A @ x
    ysim = simulate_route(plan, x)
    # add spill to sim
    sr, sc, sv = plan.spill
    np.add.at(ysim, sr, sv * x[sc])
    err = np.abs(ysim - yref).max() / (np.abs(yref).max() + 1e-9)
    ypal = np.asarray(route_spmv(plan, np.asarray(x), interpret=True))
    errp = np.abs(ypal - yref).max() / (np.abs(yref).max() + 1e-9)
    print(f"{name}: K={plan.K} T={plan.T} S={plan.S} "
          f"spill={plan.spill_frac:.4f} plan={t1-t0:.2f}s "
          f"sim_err={err:.2e} pallas_err={errp:.2e}", flush=True)
    assert err < 2e-5 and errp < 2e-5, name

# small random
check("rand 500x700 d=2%", sps.random(500, 700, 0.02, random_state=1))
# random uniform rows like the bench (scaled down)
n = 4096
cols = np.sort(rng.integers(0, n, size=(n, 32)), axis=1)
indptr = np.arange(n + 1) * 32
A = sps.csr_matrix((rng.normal(size=n*32), cols.reshape(-1), indptr),
                   shape=(n, n))
check("rand-uniform 4096x4096 nnz32", A)
# banded
check("tridiag 3000", sps.diags([-1, 4, -1], [-1, 0, 1],
                                shape=(3000, 3000)))
# skewed rows
lens = rng.zipf(1.7, size=2000).clip(0, 400)
ind = [np.sort(rng.choice(1500, size=min(l, 1500), replace=False))
       for l in lens]
indptr = np.concatenate([[0], np.cumsum([len(i) for i in ind])])
A = sps.csr_matrix((rng.normal(size=indptr[-1]),
                    np.concatenate(ind) if indptr[-1] else np.zeros(0),
                    indptr), shape=(2000, 1500))
check("zipf 2000x1500", A)
# empty
check("empty 100x100", sps.csr_matrix((100, 100)))
# single col hot (multicast)
A = sps.csr_matrix((np.ones(1000), (np.arange(1000), np.zeros(1000, int))),
                   shape=(1000, 50))
check("hot-column 1000x50", A)
print("ALL OK")
