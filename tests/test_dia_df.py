"""Double-float streaming DIA SpMV (`ops/kernels/dia_df.py`).

Same testing contract as test_bsr_df: the ~1e-15 accuracy claim holds
only on the real Mosaic path (exact IEEE f32); interpret mode goes
through XLA:CPU whose optimizer folds the error-free transforms, so it
can only assert f32-level plumbing. The accuracy of the *algorithm* is
asserted with an exact-IEEE NumPy replay of the kernel's math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spalinalg_tpu import DiaMatrix


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _np_two_sum(a, b):
    s = a + b
    bb = s - a
    return s, (a - (s - bb)) + (b - bb)


def _np_two_prod(a, b):
    SP = np.float32(4097.0)
    p = a * b
    ta = a * SP
    ah = ta - (ta - a)
    al = a - ah
    tb = b * SP
    bh = tb - (tb - b)
    bl = b - bh
    return p, ((ah * bh - p) + ah * bl + al * bh) + al * bl


def _dia_oracle(offs, data64, x64, n, m):
    y = np.zeros(n, np.float64)
    for k, o in enumerate(offs):
        i0 = max(-o, 0)
        length = min(n + min(o, 0), m - max(o, 0))
        i = np.arange(i0, i0 + length)
        y[i] += data64[k, i] * x64[i + o]
    return y


def test_dia_df_algorithm_reaches_f64_accuracy(rng):
    """Exact-IEEE NumPy replay of the per-row diagonal accumulation:
    D double-float multiply-adds per row, the same chain the Mosaic
    kernel runs per (sublane, lane) slot."""
    D, n = 9, 256
    offs = [-130, -3, -1, 0, 1, 2, 7, 64, 129]
    data64 = rng.normal(size=(D, n)) * np.exp(rng.normal(size=(D, n)) * 3)
    x64 = rng.normal(size=n + 300)
    dh = data64.astype(np.float32)
    dl = (data64 - dh.astype(np.float64)).astype(np.float32)
    xh = x64.astype(np.float32)
    xl = (x64 - xh.astype(np.float64)).astype(np.float32)
    lo = 130
    acc_h = np.zeros(n, np.float32)
    acc_l = np.zeros(n, np.float32)
    i = np.arange(n)
    for k, o in enumerate(offs):
        seg_h = xh[i + o + lo]
        seg_l = xl[i + o + lo]
        p, e = _np_two_prod(dh[k], seg_h)
        p_lo = e + dh[k] * seg_l + dl[k] * seg_h
        s2, e2 = _np_two_sum(acc_h, p)
        acc_l = acc_l + p_lo + e2
        acc_h = s2
    y = acc_h.astype(np.float64) + acc_l.astype(np.float64)
    ref = np.zeros(n, np.float64)
    for k, o in enumerate(offs):
        ref += data64[k] * x64[i + o + lo]
    scale = np.abs(data64).sum(axis=0) * np.abs(x64).max() + 1e-300
    assert (np.abs(y - ref) / scale).max() < 1e-13
    # f32 baseline genuinely worse (sanity of the scale)
    f32y = np.zeros(n, np.float32)
    for k, o in enumerate(offs):
        f32y = f32y + dh[k] * xh[i + o + lo]
    assert (np.abs(f32y.astype(np.float64) - ref) / scale).max() > 1e-9


def test_dia_df_kernel_interpret_matches_oracle(rng):
    from spalinalg_tpu.ops.kernels.dia_df import dia_spmv_df

    for (n, m, offs) in [(4096, 4096, [-1, 0, 1]),
                         (5000, 5000, [-130, -1, 0, 7, 129, 257]),
                         (300, 1000, [0, 5, 600]),
                         (1000, 300, [-299, -1, 0, 200])]:
        data = rng.normal(size=(len(offs), n))
        x = rng.normal(size=m)
        y = np.asarray(dia_spmv_df(offs, jnp.asarray(data),
                                   jnp.asarray(x), n, m, interpret=True))
        ref = _dia_oracle(offs, data, x, n, m)
        scale = np.abs(data).sum(axis=0).max() * np.abs(x).max() + 1e-300
        # interpret replays through XLA:CPU which folds the EFTs —
        # f32-level agreement only (module docstring)
        assert (np.abs(y - ref) / scale).max() < 1e-5


def test_dia_df_kernel_grads(rng):
    from spalinalg_tpu.ops.kernels.dia_df import dia_spmv_df

    n, offs = 512, [-2, 0, 3]
    data = jnp.asarray(rng.normal(size=(3, n)))
    x = jnp.asarray(rng.normal(size=n))
    g = jnp.asarray(rng.normal(size=n))

    def f(d, xx):
        return jnp.vdot(g, dia_spmv_df(offs, d, xx, n, n,
                                       interpret=True))

    def f_ref(d, xx):
        return jnp.vdot(g, DiaMatrix(n, n, offs, d)._matvec_xla(xx))

    gd, gx = jax.grad(f, argnums=(0, 1))(data, x)
    rd, rx = jax.grad(f_ref, argnums=(0, 1))(data, x)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(rd), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-5)


def test_dia_df_eligibility_gates():
    from spalinalg_tpu.ops.kernels.dia_df import dia_df_eligible

    assert dia_df_eligible([-1, 0, 1], 4096, 4096, jnp.float64)
    assert not dia_df_eligible([-1, 0, 1], 4096, 4096, jnp.float32)
    # resident hi+lo x planes beyond the VMEM budget
    assert not dia_df_eligible([0], 1 << 25, 1 << 25, jnp.float64)
    assert not dia_df_eligible([], 64, 64, jnp.float64)


def test_dia_f64_dispatch_wiring(rng):
    """On CPU the gate must stay closed (backend != tpu) and the XLA
    fallback must produce the f64 result."""
    n = 256
    offs = [-1, 0, 1]
    data = rng.normal(size=(3, n))
    dia = DiaMatrix(n, n, offs, jnp.asarray(data))
    x = rng.normal(size=n)
    assert not dia._df_eligible(jnp.asarray(x))
    y = np.asarray(dia @ x)
    ref = _dia_oracle(offs, data, x, n, n)
    np.testing.assert_allclose(y, ref, rtol=1e-12)
