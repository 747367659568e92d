"""Conjugate-gradient solver — the canonical SpMV consumer and the
framework's flagship end-to-end pipeline (COO build → CSR convert → repeated
SpMV under jit).

Works on single-chip CSR/BSR matrices and on row-partitioned
:class:`~spalinalg_tpu.parallel.partition.DistCsr` (SpMV via halo/all-gather
collectives, dot products via ``psum``). The whole iteration runs inside one
``lax.while_loop`` — no host round-trips per step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["cg", "CgResult"]


class CgResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array   # device scalar
    residual: jax.Array     # final ||r||


def _cg_loop(matvec, dot, b, x0, tol, maxiter):
    r0 = b - matvec(x0)

    def cond(state):
        x, r, p, rs, k = state
        return jnp.logical_and(k < maxiter, rs > tol * tol)

    def body(state):
        x, r, p, rs, k = state
        ap = matvec(p)
        alpha = rs / dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = dot(r, r)
        beta = rs_new / rs
        p = r + beta * p
        return (x, r, p, rs_new, k + 1)

    rs0 = dot(r0, r0)
    x, r, p, rs, k = jax.lax.while_loop(
        cond, body, (x0, r0, r0, rs0, jnp.zeros((), jnp.int32))
    )
    return CgResult(x=x, iterations=k, residual=jnp.sqrt(rs))


def cg(
    A,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    *,
    tol: float = 1e-10,
    maxiter: Optional[int] = None,
) -> CgResult:
    """Solve SPD ``A x = b`` by conjugate gradients.

    ``A`` may be a ``CsrMatrix``/``BsrMatrix`` (single chip) or a
    ``DistCsr`` (``b`` then must be a row-sharded padded vector from
    :func:`~spalinalg_tpu.parallel.spmv.shard_vector`; the result is sharded
    the same way).
    """
    from ..parallel.partition import DistCsr

    if isinstance(A, DistCsr):
        from ..parallel.spmv import dist_dot, dist_spmv

        n = A.nrows
        maxiter = maxiter if maxiter is not None else 10 * n

        def matvec(v):
            return dist_spmv(A, v)

        def dot(u, v):
            return dist_dot(u, v, A)

        x0 = jnp.zeros_like(b) if x0 is None else x0
        return _cg_loop(matvec, dot, b, x0, tol, maxiter)

    n = A.ncols
    maxiter = maxiter if maxiter is not None else 10 * n
    x0 = jnp.zeros(n, dtype=b.dtype) if x0 is None else x0

    def matvec(v):
        return A @ v

    def dot(u, v):
        return jnp.vdot(u, v)

    return _cg_loop(matvec, dot, b, x0, tol, maxiter)
