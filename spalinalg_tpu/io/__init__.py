"""I/O tier: Matrix Market interop + npz checkpoint/resume, plus scipy
bridging for oracle tests."""

from .checkpoint import load_npz, save_npz
from .matrix_market import read_matrix_market, write_matrix_market
from .jax_interop import from_bcoo, to_bcoo, to_bcsr
from .scipy_interop import from_scipy, to_scipy

__all__ = [
    "save_npz", "load_npz",
    "read_matrix_market", "write_matrix_market",
    "from_scipy", "to_scipy",
    "from_bcoo", "to_bcoo", "to_bcsr",
]
