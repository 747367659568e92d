"""Bench-harness smoke tests (CPU): the driver runs bench.py on real
hardware; these guarantee the harness itself cannot crash or emit a
malformed metric line."""

import json
import subprocess
import sys
import os

import numpy as np


def test_bench_functions_cpu():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    nnz, per = bench.bench_bsr_banded(on_tpu=False)
    assert nnz > 0 and per > 0
    nnz2, per2 = bench.bench_csr_random(on_tpu=False)
    assert nnz2 > 0 and per2 > 0


def test_metric_line_schema():
    # the JSON contract: exactly the four keys the driver records
    line = json.dumps({
        "metric": "bsr_banded_spmv_f32_nnz_per_s",
        "value": 1.0, "unit": "nnz/s", "vs_baseline": 1.0,
    })
    d = json.loads(line)
    assert set(d) == {"metric", "value", "unit", "vs_baseline"}
