"""Executes every documentation example with CI-capped iterations (pattern
from reference ``tests/integration/test_notebooks.py`` + ``ci_utils``)."""
import importlib.util
import os
import pathlib

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).parent.parent.parent / "doc" / "examples"
EXAMPLES = sorted(p.name for p in EXAMPLES_DIR.glob("*.py"))


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example, monkeypatch):
    monkeypatch.setenv("CI", "1")  # caps loop counts via ci_utils.reduce_in_tests
    path = EXAMPLES_DIR / example
    spec = importlib.util.spec_from_file_location(example[:-3], path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    module.main()
