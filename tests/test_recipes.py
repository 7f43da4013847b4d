"""Smoke-runs every recipe in examples/recipes (they must be
self-contained and CPU-runnable, like the reference's recipe CI,
``tests/integration/examples/test_recipes.py``)."""

import glob
import os
import runpy
import sys

import pytest

RECIPES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), '..', 'examples', 'recipes', '*', '*.py')))


@pytest.mark.parametrize('path', RECIPES,
                         ids=[os.path.basename(p) for p in RECIPES])
def test_recipe_runs(path, monkeypatch, capsys):
    monkeypatch.setattr(sys, 'argv', [path])
    runpy.run_path(path, run_name='__main__')
    out = capsys.readouterr().out
    assert 'Traceback' not in out
