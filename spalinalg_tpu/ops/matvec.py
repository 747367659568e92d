"""SpMV / SpMM: sparse × dense products (north-star N1/N2; absent from the
reference, whose docs only state the intent — `csr.rs:16-17`).

TPU-native formulation: with static structure, CSR SpMV is

    y = segment_sum(values * x[colind], row_ids, num_segments=nrows)

- this XLA formulation is the portable baseline: on TPU its gather is
  slow (~0.14 Gelem/s, probe_r3) so the hot path is the routed Pallas
  kernel (``ops/kernels/csr_route``) for both SpMV and SpMM, with the
  bucketed gather plan and segment_sum forms as CPU/f64/traced-structure
  fallbacks;
- padding slots carry ``row_id == nrows`` (sentinel) and zero values, so
  ``segment_sum`` drops them for free;
- ``row_ids`` are derived from ``rowptr`` once per structure and cached on
  the matrix? No — recomputed in-jit (one searchsorted over nse, fused).

CSC operands are handled by the mirror identity (CSC of A is CSR of Aᵀ with
the same arrays): ``A @ x`` scatters into rows — expressed as a segment_sum
over the minor axis is unsorted, so we instead gather x by the major
(column) ids and scatter-add by rowind. For performance-critical paths
convert to CSR once (structure is static; conversion is a one-time sort).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..convert.engine import major_ids_device
from ..errors import ShapeError

__all__ = ["matmul_dense", "csr_matvec", "csr_matmat", "csc_matvec", "csc_matmat"]


def _acc_dtype(values_dtype, x_dtype):
    d = jnp.result_type(values_dtype, x_dtype)
    # bf16 inputs accumulate in f32 (MXU/VPU-native accumulation rule).
    if d == jnp.bfloat16:
        return jnp.float32
    return d


@partial(jax.jit, static_argnames=("nrows",))
def _csr_spmv_kernel(rowptr, colind, values, x, *, nrows):
    nse = colind.shape[0]
    rows = major_ids_device(rowptr, nse)  # padding -> nrows (dropped below)
    acc = _acc_dtype(values.dtype, x.dtype)
    prod = values.astype(acc) * x[colind].astype(acc)
    y = jax.ops.segment_sum(
        prod, rows, num_segments=nrows, indices_are_sorted=True
    )
    return y


@partial(jax.jit, static_argnames=("nrows",))
def _csr_spmm_kernel(rowptr, colind, values, X, *, nrows):
    nse = colind.shape[0]
    rows = major_ids_device(rowptr, nse)
    acc = _acc_dtype(values.dtype, X.dtype)
    prod = values.astype(acc)[:, None] * X[colind, :].astype(acc)
    return jax.ops.segment_sum(
        prod, rows, num_segments=nrows, indices_are_sorted=True
    )


@partial(jax.jit, static_argnames=("nrows",))
def _csc_spmv_kernel(colptr, rowind, values, x, *, nrows):
    nse = rowind.shape[0]
    cols = major_ids_device(colptr, nse)
    acc = _acc_dtype(values.dtype, x.dtype)
    ncols = colptr.shape[0] - 1
    pad = cols >= ncols
    xg = jnp.where(pad, jnp.zeros((), acc), x[jnp.where(pad, 0, cols)].astype(acc))
    prod = values.astype(acc) * xg
    return jnp.zeros(nrows, dtype=acc).at[rowind].add(
        jnp.where(pad, jnp.zeros((), acc), prod)
    )


@partial(jax.jit, static_argnames=("nrows",))
def _csc_spmm_kernel(colptr, rowind, values, X, *, nrows):
    nse = rowind.shape[0]
    cols = major_ids_device(colptr, nse)
    acc = _acc_dtype(values.dtype, X.dtype)
    ncols = colptr.shape[0] - 1
    pad = cols >= ncols
    Xg = X[jnp.where(pad, 0, cols), :].astype(acc)
    prod = jnp.where(pad[:, None], jnp.zeros((), acc),
                     values.astype(acc)[:, None] * Xg)
    return jnp.zeros((nrows, X.shape[1]), dtype=acc).at[rowind].add(prod)


# ----------------------------------------------------------------------
# Plan-based fast path: scatter-free bucketed row reduction (N1 design).
# Built once per (concrete) structure and cached; the numeric phase is a
# jitted composition of gathers + dense reductions.
# ----------------------------------------------------------------------

from ..utils.plancache import StructureCache

_ROW_PLAN_CACHE = StructureCache(maxsize=64)


def _row_plan(csr):
    """Segmented-reduction plan over CSR rows (host-built, cached).

    Bucket widths come from :func:`config.current_config` (and key the
    cache); caching contract (ref-holding, compile-time-eval, FIFO) is
    ``utils.plancache.StructureCache``.
    """
    from ..config import current_config

    cfg = current_config()
    key = (id(csr._ptr), csr.nse, csr.nrows,
           cfg.max_bucket_width, cfg.min_bucket_width)

    def build():
        from .reduction import build_segment_reduce_plan
        import numpy as np

        sizes = np.diff(np.asarray(csr._ptr, dtype=np.int64))
        return build_segment_reduce_plan(
            sizes, max_width=cfg.max_bucket_width,
            min_width=cfg.min_bucket_width)

    return _ROW_PLAN_CACHE.get(key, (csr._ptr,), build)


def _plan_spmv(plan, colind, values, x):
    from .reduction import segment_reduce

    acc = _acc_dtype(values.dtype, x.dtype)
    prod = values.astype(acc) * x[colind].astype(acc)
    return segment_reduce(plan, prod)


def _plan_spmm(plan, colind, values, X):
    from .reduction import segment_reduce

    acc = _acc_dtype(values.dtype, X.dtype)
    prod = values.astype(acc)[:, None] * X[colind, :].astype(acc)
    return segment_reduce(plan, prod)


_plan_spmv_jit = jax.jit(_plan_spmv, static_argnums=(0,))
_plan_spmm_jit = jax.jit(_plan_spmm, static_argnums=(0,))


def _structure_concrete(mat) -> bool:
    return not isinstance(mat._ptr, jax.core.Tracer)


# ----------------------------------------------------------------------
# Routed Pallas path (kernels/csr_route): the fast unstructured-SpMV
# kernel on TPU. Requires fully concrete f32 data (values are baked
# into the routing tables) and moderate table inflation.
# ----------------------------------------------------------------------

_ROUTE_PLAN_CACHE = StructureCache(maxsize=16)


def _route_eligible(csr, x) -> bool:
    from ..config import current_config

    if not current_config().use_pallas:
        return False
    if jax.default_backend() not in ("tpu",):
        return False
    # Structure must be concrete (the routing tables are host-built);
    # values and x may both be traced — values enter through a layout
    # scatter, x through the jit-compatible kernel.
    if isinstance(csr._ptr, jax.core.Tracer):
        return False
    if jnp.result_type(csr.values.dtype, x.dtype) != jnp.float32:
        return False
    # small problems aren't worth a kernel launch + plan
    return csr.nse >= 4096


def _route_df_eligible(csr, x) -> bool:
    """Double-float route eligibility: f64 data on TPU with fully
    concrete structure AND values (the hi/lo split + bake are host
    operations). The DF kernel replaces the 0.1 %-of-roofline XLA
    emulated-f64 path (VERDICT r4 #5; reference primary scalar
    `src/scalar.rs:56-57`)."""
    from ..config import current_config

    if not current_config().use_pallas:
        return False
    if jax.default_backend() != "tpu":
        return False
    if isinstance(csr._ptr, jax.core.Tracer) or isinstance(
            csr.values, jax.core.Tracer):
        return False
    # x may be traced (the kernel call is jit-compatible); only the
    # structure and values must be concrete
    if jnp.result_type(csr.values.dtype, x.dtype) != jnp.float64:
        return False
    return csr.nse >= 4096


def _route_plan(csr):
    key = (id(csr._ptr), id(csr._minor), csr.nse, csr.nrows, csr.ncols)

    def build():
        from .kernels.csr_route import build_route_plan
        from ..utils.plandisk import load_or_build
        import numpy as np

        values = csr.values
        if isinstance(values, jax.core.Tracer):
            values = np.zeros(csr.colind.shape[0], np.float32)
        ptr = np.asarray(csr._ptr)
        col = np.asarray(csr.colind)
        vnp = np.asarray(values)
        try:
            # structure-hashed on-disk persistence: the host plan build
            # costs seconds per structure and is identical across
            # processes. Keyed on STRUCTURE ONLY (ADVICE r4 medium) —
            # values ride separately via bake/device_vals and the
            # caller's default_values are re-attached below.
            plan = load_or_build(
                "route", (ptr, col),
                (csr.nrows, csr.ncols),
                lambda: build_route_plan(ptr, col, vnp, csr.nrows,
                                         csr.ncols),
                jax_fields=("FP",), recurse=("spill_plan", "merge_plan"))
            object.__setattr__(plan, "default_values", vnp)
        except ValueError:  # ncols/table budget exceeded
            return None
        if plan.xla_resid_frac > 0.05:
            # pathological structure: too much falls through every
            # routed tier onto the XLA residual path (top-level
            # spill_frac counts recursively ROUTED entries, r5)
            return None
        return plan

    return _ROUTE_PLAN_CACHE.get(key, (csr._ptr, csr._minor), build)


def csr_matvec(csr, x: jax.Array) -> jax.Array:
    """``y = A @ x`` for CSR A (row-segmented reduction, N1).

    Dispatch, fastest first: (1) the routed Pallas kernel
    (kernels/csr_route — shape-preserving gather network, TPU only,
    concrete f32 structures); (2) the scatter-free bucketed gather
    plan; (3) the ``segment_sum`` formulation for structures traced
    under a user jit.
    """
    from ..utils.metrics import instrument

    nnz = csr.nse
    itm = jnp.dtype(csr.values.dtype).itemsize
    return instrument("csr_spmv", lambda: _csr_matvec_impl(csr, x),
                      nnz=nnz, flops=2 * nnz, bytes=(itm * 2 + 4) * nnz)


def _csr_matvec_impl(csr, x):
    if _route_eligible(csr, x):
        plan = _route_plan(csr)
        if plan is not None:
            from .kernels.csr_route import route_spmv

            return route_spmv(plan, x, csr.values)
    if _route_df_eligible(csr, x):
        plan = _route_plan(csr)
        if plan is not None:
            from .kernels.csr_route_df import route_spmv_df

            return route_spmv_df(plan, x, csr.values)
    if _structure_concrete(csr):
        return _plan_spmv_jit(_row_plan(csr), csr.colind, csr.values, x)
    return _csr_spmv_kernel(csr.rowptr, csr.colind, csr.values, x,
                            nrows=csr.nrows)


def csr_matmat(csr, X: jax.Array) -> jax.Array:
    """``Y = A @ X`` for CSR A and dense tall-skinny X (N2)."""
    from ..utils.metrics import instrument

    nnz, k = csr.nse, int(X.shape[1])
    itm = jnp.dtype(csr.values.dtype).itemsize
    return instrument(
        "csr_spmm", lambda: _csr_matmat_impl(csr, X),
        nnz=nnz, flops=2 * nnz * k, bytes=(itm * (1 + 2 * k) + 4) * nnz)


def _spmm_route_eligible(csr, X) -> bool:
    """Route-kernel eligibility for SpMM: as SpMV, plus a column-count
    bound keeping the per-page X tile inside VMEM (ncol * 64 KiB)."""
    if not _route_eligible(csr, X):
        return False
    ncol = int(X.shape[1])
    return 1 <= ncol <= 64


def _csr_matmat_impl(csr, X):
    if _spmm_route_eligible(csr, X):
        plan = _route_plan(csr)
        if plan is not None:
            from .kernels.csr_route import route_spmm

            return route_spmm(plan, X, csr.values)
    if _structure_concrete(csr):
        return _plan_spmm_jit(_row_plan(csr), csr.colind, csr.values, X)
    return _csr_spmm_kernel(csr.rowptr, csr.colind, csr.values, X,
                            nrows=csr.nrows)


# CSC fast path: one cached CSR mirror per structure, then the CSR row
# pipeline (VERDICT r1 item 7 — the direct CSC formulation scatter-adds
# by rowind, the exact primitive that serialises on TPU).
_CSC_MIRROR_CACHE = StructureCache(maxsize=16)


def _csc_mirror(csc):
    key = (id(csc._ptr), id(csc._minor), id(csc._values),
           csc.nrows, csc.ncols)

    def build():
        from ..convert.conversions import csc_to_csr

        csr = csc_to_csr(csc)
        jax.block_until_ready(csr._values)
        return csr

    return _CSC_MIRROR_CACHE.get(
        key, (csc._ptr, csc._minor, csc._values), build)


def _csc_concrete(csc) -> bool:
    return not any(isinstance(a, jax.core.Tracer)
                   for a in (csc._ptr, csc._minor, csc._values))


def csc_matvec(csc, x: jax.Array) -> jax.Array:
    from ..utils.metrics import instrument

    def run():
        if _csc_concrete(csc):
            return csr_matvec(_csc_mirror(csc), x)
        return _csc_spmv_kernel(csc.colptr, csc.rowind, csc.values, x,
                                nrows=csc.nrows)

    nnz = csc.nse
    itm = jnp.dtype(csc.values.dtype).itemsize
    return instrument("csc_spmv", run, nnz=nnz, flops=2 * nnz,
                      bytes=(itm * 2 + 4) * nnz)


def csc_matmat(csc, X: jax.Array) -> jax.Array:
    from ..utils.metrics import instrument

    def run():
        if _csc_concrete(csc):
            return csr_matmat(_csc_mirror(csc), X)
        return _csc_spmm_kernel(csc.colptr, csc.rowind, csc.values, X,
                                nrows=csc.nrows)

    nnz, k = csc.nse, int(X.shape[1])
    itm = jnp.dtype(csc.values.dtype).itemsize
    return instrument("csc_spmm", run, nnz=nnz, flops=2 * nnz * k,
                      bytes=(itm * (1 + 2 * k) + 4) * nnz)


def matmul_dense(mat, other):
    """Dispatch ``A @ dense`` to SpMV (1-D rhs) or SpMM (2-D rhs)."""
    other = jnp.asarray(other) if not isinstance(other, jax.core.Tracer) else other
    if other.ndim not in (1, 2):
        raise ShapeError(f"dense rhs must be 1-D or 2-D, got ndim={other.ndim}")
    if other.shape[0] != mat.ncols:
        raise ShapeError(
            f"dimension mismatch: {mat.shape} @ {other.shape} "
            "(reference: csr/ops/mul.rs:8)"
        )
    from ..formats.compressed import CscMatrix

    if isinstance(mat, CscMatrix):
        return csc_matvec(mat, other) if other.ndim == 1 else csc_matmat(mat, other)
    return csr_matvec(mat, other) if other.ndim == 1 else csr_matmat(mat, other)
