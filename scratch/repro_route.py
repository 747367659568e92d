import sys, os; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), jax.devices())
from spalinalg_tpu import CsrMatrix
from spalinalg_tpu.dtypes import INDEX_DTYPE

n = 1 << 13
row_nnz = 32
nnz = n * row_nnz
rng = np.random.default_rng(0)
colind = np.sort(rng.integers(0, n, size=(n, row_nnz)), axis=1)
rowptr = np.arange(n + 1, dtype=np.int64) * row_nnz
values = rng.normal(size=nnz).astype(np.float32)
csr = CsrMatrix._from_parts(n, n,
    jnp.asarray(rowptr, dtype=INDEX_DTYPE),
    jnp.asarray(colind.reshape(-1), dtype=INDEX_DTYPE),
    jnp.asarray(values))
x = jnp.asarray(rng.normal(size=n).astype(np.float32))
y = csr @ x
y.block_until_ready()
import scipy.sparse as sps
ref = sps.csr_matrix((values, colind.reshape(-1), rowptr), shape=(n,n)) @ np.asarray(x)
print("max err:", float(np.max(np.abs(np.asarray(y) - ref))))
