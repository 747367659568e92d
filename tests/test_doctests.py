"""Run the docstring examples — the reference's doctest surface (~75
rustdoc examples run by ``cargo test --doc``, `x.sh:8`). These double as
API-regression tests."""

import doctest

import pytest

import spalinalg_tpu
import spalinalg_tpu.formats.coo
import spalinalg_tpu.formats.dok
import spalinalg_tpu.formats.compressed

MODULES = [
    spalinalg_tpu.formats.coo,
    spalinalg_tpu.formats.dok,
    spalinalg_tpu.formats.compressed,
]


@pytest.mark.parametrize("mod", MODULES, ids=lambda m: m.__name__)
def test_doctests(mod):
    results = doctest.testmod(mod, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures in {mod.__name__}"
    assert results.attempted > 0, f"no doctests collected in {mod.__name__}"
