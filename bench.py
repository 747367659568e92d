"""Headline benchmark: CSR SpMV throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "nnz/s", "vs_baseline": N}

Baseline definition (BASELINE.md): the reference publishes no numbers; the
target is >= 70 % of the HBM-bandwidth roofline. ``vs_baseline`` is
``achieved / (0.70 * roofline)`` where the roofline counts the minimal CSR
traffic (value + colind + one operand-vector access per nnz).

Extra diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


# HBM bandwidth by TPU generation (GB/s); v5e default for this environment.
_HBM_GBPS = {
    "v4": 1228.0,
    "v5e": 819.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
}


def _detect_hbm_gbps() -> float:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    for k, v in _HBM_GBPS.items():
        if k in gen:
            return v
    return _HBM_GBPS["v5e"]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from spalinalg_tpu import CsrMatrix
    from spalinalg_tpu.dtypes import INDEX_DTYPE

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)

    # Matrix: 2^20 rows x 32 nnz/row (~33.5M nnz), f32, random columns.
    n = 1 << 20 if on_tpu else 1 << 14
    row_nnz = 32
    nnz = n * row_nnz
    rng = np.random.default_rng(0)
    colind = rng.integers(0, n, size=nnz).astype(np.int64)
    # sort within rows so the CSR invariant's spirit holds (dups harmless)
    colind = colind.reshape(n, row_nnz)
    colind.sort(axis=1)
    rowptr = np.arange(n + 1, dtype=np.int64) * row_nnz
    values = rng.normal(size=nnz).astype(np.float32)

    csr = CsrMatrix._from_parts(
        n, n,
        jnp.asarray(rowptr, dtype=INDEX_DTYPE),
        jnp.asarray(colind.reshape(-1), dtype=INDEX_DTYPE),
        jnp.asarray(values),
    )
    x = jnp.asarray(rng.normal(size=n).astype(np.float32))

    # Warm-up (compiles the plan kernels).
    y = csr @ x
    y.block_until_ready()

    iters = 20 if on_tpu else 5
    t0 = time.perf_counter()
    for _ in range(iters):
        y = csr @ x
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    nnz_per_s = nnz / dt

    # Roofline: minimal CSR traffic/nnz = 4B value + 4B colind + 4B x-gather
    # (y writes amortise over row_nnz).
    bytes_per_nnz = 12.0
    hbm = _detect_hbm_gbps() * 1e9
    roofline = hbm / bytes_per_nnz
    target = 0.70 * roofline
    frac = nnz_per_s / roofline

    print(
        f"[bench] backend={backend} n={n} nnz={nnz} dt={dt*1e3:.3f}ms "
        f"-> {nnz_per_s/1e9:.2f} Gnnz/s ({100*frac:.1f}% of roofline "
        f"{roofline/1e9:.1f} Gnnz/s)",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "spmv_csr_f32_nnz_per_s",
        "value": round(nnz_per_s, 1),
        "unit": "nnz/s",
        "vs_baseline": round(nnz_per_s / target, 4),
    }))


if __name__ == "__main__":
    main()
