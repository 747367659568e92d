import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import scipy.sparse as sps
import spalinalg_tpu.ops.kernels.csr_route as cr

rng = np.random.default_rng(0)

def check(name, A, K=None):
    A = A.tocsr(); A.sort_indices()
    n, mcols = A.shape
    x = rng.normal(size=mcols)
    if K is not None:
        orig = cr._choose_K
        cr._choose_K = lambda *a: K
    try:
        plan = cr.build_route_plan(A.indptr, A.indices, A.data, n, mcols)
    finally:
        if K is not None:
            cr._choose_K = orig
    yref = A @ x
    ysim = cr.simulate_route(plan, x)
    sr, sc, sv = plan.spill
    np.add.at(ysim, sr, sv * x[sc])
    err = np.abs(ysim - yref)
    bad = np.flatnonzero(err > 1e-4 * (np.abs(yref).max() + 1))
    print(f"{name}: K={plan.K} T={plan.T} S={plan.S} "
          f"spill={plan.spill_frac:.4f} nvr={plan.vrow_src.size} "
          f"maxerr={err.max():.2e} nbadrows={bad.size}")
    if bad.size:
        r = bad[0]
        print("  bad row", r, "ref", yref[r], "sim", ysim[r])
    return bad.size == 0

# small uniform with forced K=1 (vrow exercise)
n = 512
cols = np.sort(rng.integers(0, n, size=(n, 4)), axis=1)
A = sps.csr_matrix((rng.normal(size=n*4),
                    cols.reshape(-1), np.arange(n+1)*4), shape=(n, n))
check("uniform4 K=1", A, K=1)
check("uniform4 K=4", A, K=4)
check("uniform4 auto", A)
# banded exact-load (repair exercise)
check("tridiag 3000", sps.diags([-1., 4., -1.], [-1, 0, 1],
                                shape=(3000, 3000)))
