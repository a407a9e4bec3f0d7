"""Perf/bench scripts must at least parse (they're run manually on the
TPU host; a syntax regression would otherwise surface only there)."""

import ast
import glob
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(
    glob.glob(os.path.join(ROOT, "scripts", "*.py"))
    + [os.path.join(ROOT, "bench.py"),
       os.path.join(ROOT, "__graft_entry__.py")])


@pytest.mark.parametrize("path", SCRIPTS,
                         ids=[os.path.basename(p) for p in SCRIPTS])
def test_script_parses(path):
    with open(path) as fh:
        ast.parse(fh.read(), filename=path)
