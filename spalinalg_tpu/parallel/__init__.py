"""Distributed tier: row partitioning + collective SpMV/SpMM (N6/N7)."""

from .bsr import DistBsr, dist_bsr_spmv, partition_bsr, shard_bsr_vector
from .partition import DistCsr, make_row_mesh, partition_csr
from .spmv import (
    dist_dot,
    dist_spmm,
    dist_spmv,
    shard_matrix_rows,
    shard_vector,
    unshard_vector,
)

__all__ = [
    "DistCsr", "make_row_mesh", "partition_csr",
    "dist_spmv", "dist_spmm", "dist_dot",
    "shard_vector", "shard_matrix_rows", "unshard_vector",
    "DistBsr", "partition_bsr", "dist_bsr_spmv", "shard_bsr_vector",
]
