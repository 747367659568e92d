"""Sparse LU factorization with triangular solve (north-star N5).

Same pipeline as `cholesky.py` for the banded/no-pivot case (RCM → panelled
band LU in a ``lax.scan``). General matrices that need pivoting, or whose
RCM band is a large fraction of n, use the dense partial-pivoting fallback
(``jax.scipy.linalg.lu_factor``) — correct for every input, with the banded
MXU path covering the structured systems the framework targets
(diagonally-dominant stencil operators, BASELINE config[3]).

Examples
--------
>>> import numpy as np
>>> from spalinalg_tpu import CsrMatrix
>>> from spalinalg_tpu.linalg import lu, lu_solve
>>> A = CsrMatrix(3, 3, [0, 2, 4, 6], [0, 1, 0, 1, 1, 2],
...               [4.0, 1.0, 1.0, 3.0, 1.0, 2.0])
>>> fac = lu(A)
>>> x = lu_solve(fac, np.array([5.0, 4.0, 3.0]))
>>> bool(np.allclose(A.to_dense() @ np.asarray(x), [5.0, 4.0, 3.0]))
True
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..errors import ShapeError
from .banded import BandLuFactor, band_lu_factor, band_lu_solve
from .cholesky import permute_csr
from .ordering import bandwidth as _bandwidth, rcm_ordering

__all__ = ["LuFactor", "lu", "lu_solve"]


@dataclass(frozen=True, eq=False)
class LuFactor:
    n: int
    perm: Optional[np.ndarray]
    band: Optional[BandLuFactor]
    dense_lu: Optional[tuple]  # (lu, piv) from jax.scipy.linalg.lu_factor


def lu(csr, *, reorder: bool = True, panel: int = 64,
       dense_threshold: float = 0.45, pivot: bool = False) -> LuFactor:
    """Factor ``A = L U``.

    ``pivot=True`` forces the dense partial-pivoting path (numerically safe
    for arbitrary matrices); the default banded path does no pivoting and
    targets diagonally-dominant / RCM-banded systems.
    """
    if csr.nrows != csr.ncols:
        raise ShapeError(f"LU needs a square matrix, got {csr.shape}")
    n = csr.nrows

    perm = None
    mat = csr
    bw = _bandwidth(csr)
    if reorder and not pivot:
        p = rcm_ordering(csr)
        pm = permute_csr(csr, p)
        pbw = _bandwidth(pm)
        if pbw < bw:
            perm, mat, bw = p, pm, pbw

    if pivot or n <= 2 or bw >= max(2, int(dense_threshold * n)):
        from jax.scipy.linalg import lu_factor

        dense = mat.to_dense()
        return LuFactor(n=n, perm=perm, band=None, dense_lu=lu_factor(dense))

    fac = band_lu_factor(mat, bandwidth=bw, panel=panel)
    return LuFactor(n=n, perm=perm, band=fac, dense_lu=None)


def lu_solve(fac: LuFactor, b) -> jax.Array:
    """Solve ``A x = b`` given an :func:`lu` factor."""
    b = jnp.asarray(b)
    bp = b[jnp.asarray(fac.perm)] if fac.perm is not None else b
    if fac.dense_lu is not None:
        from jax.scipy.linalg import lu_solve as _dense_solve

        xp = _dense_solve(fac.dense_lu, bp)
    else:
        xp = band_lu_solve(fac.band, bp)
    if fac.perm is not None:
        iperm = np.empty(fac.n, dtype=np.int64)
        iperm[fac.perm] = np.arange(fac.n)
        return xp[jnp.asarray(iperm)]
    return xp
