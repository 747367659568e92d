"""Bench-harness smoke tests (CPU): the driver runs bench.py on real
hardware; these guarantee the harness itself cannot crash or emit a
malformed metric line."""

import json
import os
import subprocess
import sys

import numpy as np


def test_measure_helpers_cpu():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    bsr, x0, nnz = bench._make_bsr(8, "f32")
    assert nnz > 0
    per, diag = bench._measure(lambda v: bsr @ v, x0, ks=(1, 2, 3), reps=1)
    assert per is None or per > 0
    assert "totals_ms" in diag

    csr, cx, cnnz = bench._make_csr(1 << 10, 8)
    assert bench._csr_path(csr, cx) in ("route", "bucket_plan",
                                        "segment_sum")


def test_measure_rejects_impossible_rates():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    bsr, x0, _ = bench._make_bsr(4, "f32")
    # a roofline so low no real measurement can satisfy it -> must
    # come back as None (invalid), never as a number
    per, diag = bench._measure(lambda v: bsr @ v, x0, ks=(1, 2, 3),
                               reps=1, max_rate=1e-12, tries=2)
    assert per is None


def test_bench_main_cpu_emits_valid_json():
    """Run the whole harness on CPU; the last stdout line must be the
    driver's metric contract."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, BENCH_TIMEOUT_S="900", BENCH_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=880, env=env, cwd=repo)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "bsr_banded_spmv_f32_nnz_per_s"
    assert isinstance(d["value"], (int, float))
    assert isinstance(d["vs_baseline"], (int, float))
    assert d["unit"] == "nnz/s"
    sec = d["secondary"]
    # validity contract: any reported roofline fraction must be <= ~1
    for k, v in sec.items():
        if k.endswith("_roofline_frac") and v is not None:
            assert v <= 1.05, (k, v)
    # path tags present for the attributable metrics
    assert "bsr_f32_path" in sec and "csr_random_spmv_nnz_per_s_path" in sec
