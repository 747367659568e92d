"""Verify-skill driver: canonical end-to-end flow on the REAL TPU.

COO build -> CSR convert -> SpMV (BASELINE config[0], f32 on TPU),
plus add, SpGEMM, to_csc, transpose, to_bsr @ x — each checked
against a numpy oracle.
"""
import sys

import numpy as np

import spalinalg_tpu as sp


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    n = 1000
    nnz = 10000
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.normal(size=nnz).astype(np.float32)
    coo = sp.CooMatrix.with_triplets(n, n, rows, cols, vals)
    csr = sp.CsrMatrix.from_coo(coo)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), vals)
    x = rng.normal(size=n).astype(np.float32)

    y = np.asarray(csr @ x)
    ref = dense @ x
    err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-30)
    print(f"spmv rel err {err:.2e}")
    assert err < 1e-5

    s = csr + csr
    err = np.abs(np.asarray(s.to_dense()) - 2 * dense).max()
    print(f"add abs err {err:.2e}")
    assert err < 1e-4

    p = csr * csr
    refp = dense @ dense
    err = np.abs(np.asarray(p.to_dense()) - refp).max() / (
        np.abs(refp).max() + 1e-30)
    print(f"spgemm rel err {err:.2e}")
    assert err < 1e-4

    csc = csr.to_csc()
    err = np.abs(np.asarray(csc.to_dense()) - dense).max()
    assert err < 1e-6, err
    t = csr.transpose()
    err = np.abs(np.asarray(t.to_dense()) - dense.T).max()
    assert err < 1e-6, err
    print("to_csc/transpose exact")

    bsr = csr.to_bsr(8)
    yb = np.asarray(bsr @ x)
    err = np.abs(yb - ref).max() / (np.abs(ref).max() + 1e-30)
    print(f"bsr spmv rel err {err:.2e}")
    assert err < 1e-5

    print("VERIFY OK")


if __name__ == "__main__":
    sys.exit(main())
