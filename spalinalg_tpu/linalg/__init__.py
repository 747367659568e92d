"""Factorization + solver tier (north-star N5 and the iterative consumers)."""

from .cg import CgResult, cg
from .funm import arnoldi, expm_multiply
from .eigen import block_lanczos, eigsh, lanczos, lobpcg, svds
from .cholesky import CholeskyFactor, cholesky, cholesky_solve, permute_csr
from .lu import LuFactor, lu, lu_solve
from .iterative import IterResult, bicgstab, gmres
from .precond import ChebyshevPrecond, Ilu0Precond, chebyshev, ic0, ilu0
from .solve import factorized, is_symmetric, spsolve
from .ordering import bandwidth, level_schedule, rcm_ordering
from .qr import (
    QrFactor,
    lstsq,
    qr,
    qr_q_apply,
    qr_qt_apply,
    qr_r_dense,
    qr_solve,
)
from .triangular import TriangularPlan, plan_triangular, solve_triangular_csr
from .banded import (
    BandCholeskyFactor,
    BandLuFactor,
    band_cholesky_factor,
    band_cholesky_solve,
    band_lu_factor,
    band_lu_solve,
)

__all__ = [
    "cg", "CgResult", "gmres", "bicgstab", "IterResult",
    "eigsh", "svds", "lanczos", "block_lanczos", "lobpcg",
    "ilu0", "ic0", "Ilu0Precond", "chebyshev", "ChebyshevPrecond",
    "expm_multiply", "arnoldi",
    "cholesky", "cholesky_solve", "CholeskyFactor", "permute_csr",
    "lu", "lu_solve", "LuFactor",
    "qr", "qr_solve", "qr_q_apply", "qr_qt_apply", "qr_r_dense",
    "lstsq", "QrFactor",
    "spsolve", "factorized", "is_symmetric",
    "rcm_ordering", "bandwidth", "level_schedule",
    "solve_triangular_csr", "plan_triangular", "TriangularPlan",
    "band_cholesky_factor", "band_cholesky_solve", "BandCholeskyFactor",
    "band_lu_factor", "band_lu_solve", "BandLuFactor",
]
