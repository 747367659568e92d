"""TPU perf experiment battery — run when the device is reachable.

Each experiment is a subprocess (wedge-tolerant) with a timeout; results
land as JSON lines in tools/tpu_tuning_results.jsonl. Usage:

    python tools/tpu_tuning.py            # run all
    python tools/tpu_tuning.py group bf16 # selected experiments

Experiments:
- group:  _V3_GROUP sweep (16/32/64) on the bench BSR case
- bf16:   f32 vs bf16 block storage
- csr:    routed kernel vs bucketed plan on the bench CSR case
- spmm:   CSR SpMM plan path at K=64
- spgemm: routed SpGEMM numeric phase
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

HEALTH = (
    "import jax.numpy as jnp;"
    "print(float(jnp.sum(jnp.ones((128,)))))"
)


def healthy(timeout=90) -> bool:
    try:
        out = subprocess.run([sys.executable, "-c", HEALTH],
                             timeout=timeout, capture_output=True, text=True)
        return out.returncode == 0 and "128.0" in out.stdout
    except subprocess.TimeoutExpired:
        return False


GROUP_SNIPPET = """
import time, numpy as np, jax, jax.numpy as jnp
import spalinalg_tpu.ops.kernels.bsr_stream as bs
from spalinalg_tpu import BsrMatrix
from spalinalg_tpu.dtypes import INDEX_DTYPE
G = {group}
bs_ = 128; nbr = 512
n = nbr * bs_
rng = np.random.default_rng(0)
indptr=[0]; indices=[]
for i in range(nbr):
    cols=[j for j in (i-1,i,i+1) if 0<=j<nbr]; indices.extend(cols); indptr.append(len(indices))
nblocks=len(indices)
data = rng.normal(size=(nblocks,bs_,bs_)).astype({dtype})
x = jnp.asarray(rng.normal(size=n).astype(np.float32))
ip = jnp.asarray(np.asarray(indptr), dtype=INDEX_DTYPE)
ic = jnp.asarray(np.asarray(indices), dtype=INDEX_DTYPE)
from functools import partial
@partial(jax.jit, static_argnames=('k',))
def loop(x, k):
    def body(i, xc):
        y = bs._stream_call_v3(ip, ic, jnp.asarray(data), xc, interpret=False, group=G).reshape(-1)[:n]
        return y / (jnp.max(jnp.abs(y)) + 1.0)
    return jax.lax.fori_loop(0, k, body, x)
def timed(k):
    best=None
    _=float(loop(x*np.float32(1.000001), k=k)[0])
    for r in range(3):
        xs = x*np.float32(1+ (r+2)*1e-6)
        t0=time.perf_counter(); _=float(loop(xs,k=k)[0]); dt=time.perf_counter()-t0
        best = dt if best is None else min(best,dt)
    return best
d_lo, d_hi = timed(33), timed(129)
per = (d_hi-d_lo)/96
nnz = nblocks*bs_*bs_
print('RESULT', {group}, nnz/per/1e9)
"""


def run_snippet(code, timeout=900):
    try:
        out = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                             capture_output=True, text=True)
        return out.returncode, out.stdout, out.stderr
    except subprocess.TimeoutExpired:
        return -1, "", "TIMEOUT"


def log(rec):
    rec["ts"] = time.time()
    with open("tools/tpu_tuning_results.jsonl", "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def exp_group():
    for g in (16, 32, 64, 128):
        rc, out, err = run_snippet(
            GROUP_SNIPPET.format(group=g, dtype="np.float32"))
        rate = None
        for line in out.splitlines():
            if line.startswith("RESULT"):
                rate = float(line.split()[-1])
        log({"exp": "group", "group": g, "gnnz_s": rate, "rc": rc,
             "err": err[-200:] if rc else ""})


def exp_bf16():
    for dt in ("np.float32", "jnp.bfloat16"):
        rc, out, err = run_snippet(GROUP_SNIPPET.format(group=32, dtype=dt))
        rate = None
        for line in out.splitlines():
            if line.startswith("RESULT"):
                rate = float(line.split()[-1])
        log({"exp": "bf16", "dtype": dt, "gnnz_s": rate, "rc": rc,
             "err": err[-200:] if rc else ""})


def exp_bench():
    rc, out, err = run_snippet("import runpy; runpy.run_path('bench.py', run_name='__main__')",
                               timeout=1600)
    log({"exp": "bench", "rc": rc, "stdout": out[-500:], "stderr": err[-800:]})


def main():
    sel = set(sys.argv[1:])
    if not healthy():
        print("TPU readback not healthy; aborting", file=sys.stderr)
        sys.exit(2)
    if not sel or "group" in sel:
        exp_group()
    if not sel or "bf16" in sel:
        exp_bf16()
    if not sel or "bench" in sel:
        exp_bench()


if __name__ == "__main__":
    main()
