import sys; sys.path.insert(0, "/root/repo")
import numpy as np, spalinalg_tpu as sp

rng = np.random.default_rng(1)
n = 1000
nnz = 10000
rows = rng.integers(0, n, nnz); cols = rng.integers(0, n, nnz)
vals = rng.normal(size=nnz)
coo = sp.CooMatrix.with_triplets(n, n, rows.tolist(), cols.tolist(), vals.tolist())
csr = sp.CsrMatrix.from_coo(coo)
x = rng.normal(size=n)
y = np.asarray(csr @ x)
dense = np.asarray(coo.to_dense())
assert np.allclose(y, dense @ x, atol=1e-8), "SpMV mismatch"
s = csr + csr
assert np.allclose(np.asarray(s.to_dense()), 2*dense, atol=1e-8), "add mismatch"
p = csr * csr
assert np.allclose(np.asarray(p.to_dense()), dense @ dense, atol=1e-6), "SpGEMM mismatch"
csc = csr.to_csc()
assert np.allclose(np.asarray(csc.to_dense()), dense), "to_csc mismatch"
t = csr.transpose()
assert np.allclose(np.asarray(t.to_dense()), dense.T), "transpose mismatch"
b = csr.to_bsr(8)
yb = np.asarray(b @ x)
assert np.allclose(yb, dense @ x, atol=1e-5), "BSR SpMV mismatch"
print("verify drive OK: spmv/add/spgemm/csc/transpose/bsr all match oracle")
