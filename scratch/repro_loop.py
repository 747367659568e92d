import sys, os; sys.path.insert(0, "/root/repo")
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from spalinalg_tpu import CsrMatrix
from spalinalg_tpu.dtypes import INDEX_DTYPE

n, row_nnz = 1 << 13, 32
nnz = n * row_nnz
rng = np.random.default_rng(0)
colind = np.sort(rng.integers(0, n, size=(n, row_nnz)), axis=1)
rowptr = np.arange(n + 1, dtype=np.int64) * row_nnz
values = rng.normal(size=nnz).astype(np.float32)
csr = CsrMatrix._from_parts(n, n,
    jnp.asarray(rowptr, dtype=INDEX_DTYPE),
    jnp.asarray(colind.reshape(-1), dtype=INDEX_DTYPE),
    jnp.asarray(values))
x0 = jnp.asarray(rng.normal(size=n).astype(np.float32))

@partial(jax.jit, static_argnames=("k",))
def loop(x, k):
    def body(i, xc):
        y = csr @ xc
        return y / (jnp.max(jnp.abs(y)) + 1.0)
    return jax.lax.fori_loop(0, k, body, x)

out = loop(x0, k=3)
print("loop OK:", float(out[0]))
