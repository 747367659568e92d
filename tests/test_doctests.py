"""Run the docstring examples — the reference's doctest surface (~75
rustdoc examples run by ``cargo test --doc``, `x.sh:8`). These double as
API-regression tests. Every public module with a user-facing API carries
examples (VERDICT r1 item 8)."""

import doctest
import importlib

import pytest

# importlib (not attribute access): `spalinalg_tpu.linalg.cg` the *module*
# is shadowed by the re-exported `cg` *function* in linalg/__init__.py.
MODULE_NAMES = [
    "spalinalg_tpu.config",
    "spalinalg_tpu.formats.bsr",
    "spalinalg_tpu.formats.compressed",
    "spalinalg_tpu.formats.coo",
    "spalinalg_tpu.formats.device",
    "spalinalg_tpu.formats.dia",
    "spalinalg_tpu.formats.dok",
    "spalinalg_tpu.io.checkpoint",
    "spalinalg_tpu.io.jax_interop",
    "spalinalg_tpu.io.matrix_market",
    "spalinalg_tpu.io.scipy_interop",
    "spalinalg_tpu.linalg.cg",
    "spalinalg_tpu.linalg.iterative",
    "spalinalg_tpu.linalg.cholesky",
    "spalinalg_tpu.linalg.eigen",
    "spalinalg_tpu.linalg.funm",
    "spalinalg_tpu.linalg.lu",
    "spalinalg_tpu.linalg.precond",
    "spalinalg_tpu.linalg.qr",
    "spalinalg_tpu.linalg.solve",
    "spalinalg_tpu.linalg.triangular",
    "spalinalg_tpu.ops.elementwise",
    "spalinalg_tpu.ops.indexing",
    "spalinalg_tpu.ops.reduce_api",
    "spalinalg_tpu.ops.spgemm",
    "spalinalg_tpu.ops.construct",
    "spalinalg_tpu.ops.structure",
    "spalinalg_tpu.parallel.partition",
    "spalinalg_tpu.utils.metrics",
]

MODULES = [importlib.import_module(n) for n in MODULE_NAMES]


@pytest.mark.parametrize("mod", MODULES, ids=lambda m: m.__name__)
def test_doctests(mod):
    results = doctest.testmod(mod, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {mod.__name__}"
    assert results.attempted > 0, f"no doctests collected in {mod.__name__}"
