import sys, time, itertools
sys.path.insert(0, "/root/repo")
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from spalinalg_tpu.ops.kernels.csr_route import build_route_plan, route_spmv

_seed = itertools.count(1)

def loop_rate(matvec, x0, k2=17, reps=2):
    @partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        def body(i, xc):
            y = matvec(xc)
            return y / (jnp.max(jnp.abs(y)) + 1.0)
        return jax.lax.fori_loop(0, k, body, x)
    def timed(k):
        xs = x0 * np.float32(1 + next(_seed) * 1e-6)
        t0 = time.perf_counter()
        _ = float(loop(xs, k=k)[0])
        return time.perf_counter() - t0
    _ = timed(1)
    d1 = min(timed(1) for _ in range(reps))
    _ = timed(k2)
    d2 = min(timed(k2) for _ in range(reps))
    return max((d2 - d1) / (k2 - 1), 1e-9)

print("backend:", jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
n = 1 << 16
row_nnz = 32
nnz = n * row_nnz
colind = np.sort(rng.integers(0, n, size=(n, row_nnz)), axis=1)
rowptr = np.arange(n + 1, dtype=np.int64) * row_nnz
values = rng.normal(size=nnz).astype(np.float32)

t0 = time.perf_counter()
plan = build_route_plan(rowptr, colind.reshape(-1), values, n, n)
t1 = time.perf_counter()
print(f"plan: {t1-t0:.2f}s K={plan.K} T={plan.T} S={plan.S} RPP={plan.RPP} "
      f"spill={plan.spill_frac:.5f} tables={plan.table_bytes/1e6:.0f}MB",
      flush=True)

x0 = jnp.asarray(rng.normal(size=n).astype(np.float32))
y = np.asarray(route_spmv(plan, x0))
import scipy.sparse as sps
A = sps.csr_matrix((values, colind.reshape(-1), rowptr), shape=(n, n))
yref = A @ np.asarray(x0)
err = np.abs(y - yref).max() / np.abs(yref).max()
print("relerr:", err, flush=True)
assert err < 1e-4

per = loop_rate(lambda v: route_spmv(plan, v), x0)
print(f"routed spmv: {per*1e3:.3f} ms -> {nnz/per/1e9:.2f} Gnnz/s", flush=True)
