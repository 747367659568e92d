"""Double-float (two-f32) BSR SpMV (`ops/kernels/bsr_df.py`).

The accuracy claim (~1e-13 relative vs the f64 oracle) holds on the
REAL Mosaic kernel path, where f32 ops are exact IEEE. It cannot be
asserted through interpret mode: XLA's optimizer rewrites the
error-free transformations (measured 0.17 rel err for a bare jnp-jit
TwoSum chain on CPU — the algebraic simplifier folds Dekker splits).
So the suite checks:

- the algorithm itself in exact-IEEE NumPy f32 (the same math the
  Mosaic kernel runs) against the f64 oracle at 1e-13;
- the kernel plumbing in interpret mode at f32-level tolerance;
- dispatch wiring and eligibility gates.
"""

import numpy as np
import pytest
import scipy.sparse as ss

import jax
import jax.numpy as jnp

from spalinalg_tpu import BsrMatrix
from spalinalg_tpu.dtypes import INDEX_DTYPE


def _banded_bsr(nbr, bs, rng, scale_pow=0.0):
    n = nbr * bs
    indptr = [0]
    indices = []
    for i in range(nbr):
        cols = [j for j in (i - 1, i, i + 1) if 0 <= j < nbr]
        indices.extend(cols)
        indptr.append(len(indices))
    nblocks = len(indices)
    data = rng.normal(size=(nblocks, bs, bs)).astype(np.float64)
    if scale_pow:
        data *= np.exp(rng.normal(size=(nblocks, 1, 1)) * scale_pow)
    bsr = BsrMatrix._from_parts(
        n, n, bs, bs,
        jnp.asarray(np.asarray(indptr), dtype=INDEX_DTYPE),
        jnp.asarray(np.asarray(indices), dtype=INDEX_DTYPE),
        jnp.asarray(data))
    sp = ss.bsr_matrix((data, indices, indptr), shape=(n, n))
    return bsr, sp


def _np_two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _np_two_prod(a, b):
    f = np.float32
    SP = f(4097.0)
    p = a * b
    ta = a * SP
    ah = ta - (ta - a)
    al = a - ah
    tb = b * SP
    bh = tb - (tb - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def test_df_algorithm_reaches_f64_accuracy(rng):
    """The exact-IEEE replay of the kernel math (NumPy f32) must sit at
    ~1e-13 relative — this is what Mosaic executes (measured 9.5e-16
    on v5e for the same structure)."""
    n = 512  # power of two: the kernel's halving tree runs on bc=128
    a64 = rng.normal(size=n) * np.exp(rng.normal(size=n) * 3)
    x64 = rng.normal(size=n)
    ah = a64.astype(np.float32)
    al = (a64 - ah.astype(np.float64)).astype(np.float32)
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    ph, pe = _np_two_prod(ah, xh)
    plo = pe + ah * xl + al * xh
    size = n
    while size > 1:
        h = size // 2
        s, e = _np_two_sum(ph[:h], ph[h:size])
        plo = plo[:h] + plo[h:size] + e
        ph = s
        size = h
    y = np.float64(ph[0]) + np.float64(plo[0])
    ref = a64 @ x64
    scale = np.abs(a64 * x64).sum()
    assert abs(y - ref) / scale < 1e-13
    # and the f32 baseline is genuinely worse (sanity of the scale)
    f32y = np.float64(ah @ xh)
    assert abs(f32y - ref) / scale > 1e-10


def test_df_kernel_interpret_matches_oracle(rng):
    from spalinalg_tpu.ops.kernels.bsr_df import bsr_matvec_df

    bsr, sp = _banded_bsr(6, 128, rng, scale_pow=3.0)
    x = rng.normal(size=bsr.nrows)
    y = np.asarray(bsr_matvec_df(bsr, jnp.asarray(x), interpret=True))
    ref = sp @ x
    scale = np.abs(sp).sum(axis=1).A.ravel() * np.abs(x).max() + 1e-300
    # interpret goes through XLA:CPU, which rewrites the EFTs — only
    # f32-level agreement can be asserted here (see module docstring)
    assert (np.abs(y - ref) / scale).max() < 1e-5


def test_df_algorithm_non_power_of_two_tree(rng):
    """bc=384 (3x128) runs the remainder-fold variant of the halving
    tree (ADVICE r4 high: the bare tree silently broadcast at odd
    sizes and dropped a partial sum). Exact-IEEE NumPy replay of the
    kernel's math must still reach ~1e-13."""
    for n in (384, 640, 896):
        a64 = rng.normal(size=n) * np.exp(rng.normal(size=n) * 3)
        x64 = rng.normal(size=n)
        ah = a64.astype(np.float32)
        al = (a64 - ah.astype(np.float64)).astype(np.float32)
        xh = x64.astype(np.float32)
        xl = (x64 - xh.astype(np.float64)).astype(np.float32)
        ph, pe = _np_two_prod(ah, xh)
        plo = pe + ah * xl + al * xh
        size = n
        p2 = 1 << (size.bit_length() - 1)
        if p2 != size:
            rem = size - p2
            s, e = _np_two_sum(ph[:rem], ph[p2:size])
            plo = np.concatenate([plo[:rem] + plo[p2:size] + e,
                                  plo[rem:p2]])
            ph = np.concatenate([s, ph[rem:p2]])
            size = p2
        while size > 1:
            h = size // 2
            s, e = _np_two_sum(ph[:h], ph[h:size])
            plo = plo[:h] + plo[h:size] + e
            ph = s
            size = h
        y = np.float64(ph[0]) + np.float64(plo[0])
        ref = a64 @ x64
        scale = np.abs(a64 * x64).sum()
        assert abs(y - ref) / scale < 1e-13, n


def test_df_kernel_interpret_bc384(rng):
    """Kernel plumbing for a non-power-of-two block width: every
    partial sum must land (the pre-fix tree dropped one at size 3)."""
    from spalinalg_tpu.ops.kernels.bsr_df import bsr_matvec_df

    bs = 384
    bsr, sp = _banded_bsr(3, bs, rng)
    x = rng.normal(size=bsr.nrows)
    y = np.asarray(bsr_matvec_df(bsr, jnp.asarray(x), interpret=True))
    ref = sp @ x
    scale = np.abs(sp).sum(axis=1).A.ravel() * np.abs(x).max() + 1e-300
    assert (np.abs(y - ref) / scale).max() < 1e-5


def test_df_split_is_exact(rng):
    from spalinalg_tpu.ops.kernels.bsr_df import split_df

    v = jnp.asarray(rng.normal(size=1000) * np.exp(rng.normal(size=1000) * 5))
    hi, lo = split_df(v)
    back = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    # hi is the rounded f32, the residual re-rounds to f32: the pair
    # reconstructs v to ~2^-48 relative (double-float, not bit-exact)
    rel = np.abs(back - np.asarray(v)) / np.maximum(np.abs(v), 1e-300)
    assert rel.max() < 1e-13


def test_df_eligibility_gates():
    from spalinalg_tpu.ops.kernels.bsr_df import df_eligible

    assert df_eligible(8, 22, 128, 128, jnp.float64)
    assert not df_eligible(8, 22, 128, 128, jnp.float32)
    assert not df_eligible(8, 22, 64, 100, jnp.float64)   # lane align
    assert not df_eligible(8, 0, 128, 128, jnp.float64)   # empty
    assert not df_eligible(1 << 18, 22, 128, 128, jnp.float64)  # y VMEM


def test_df_dispatch_gate_cpu(rng):
    # on the CPU backend the dispatch must stay on the XLA path
    from spalinalg_tpu.ops import bsr_ops

    bsr, sp = _banded_bsr(4, 128, rng)
    x = rng.normal(size=bsr.nrows)
    assert not bsr_ops._df_dispatch(bsr, jnp.asarray(x))
    y = np.asarray(bsr @ jnp.asarray(x))
    np.testing.assert_allclose(y, sp @ x, rtol=1e-12)
