"""
Every tutorial in docs/tutorials/ is executable documentation: each is
self-checking (asserts its own claims) and must run cleanly end-to-end.
Counterpart of the reference's executed mkdocs notebooks.
"""

import pathlib
import runpy

import pytest

TUTORIALS = sorted(
    (pathlib.Path(__file__).resolve().parents[1] / "docs" / "tutorials").glob("*.py")
)

_HEAVY = {"01", "06", "07", "10", "11"}  # multi-compile / MCMC / full-MAGICC


def _params():
    out = []
    for path in TUTORIALS:
        marks = [pytest.mark.slow] if path.name[:2] in _HEAVY else []
        out.append(pytest.param(path, id=path.stem, marks=marks))
    return out


@pytest.mark.parametrize("path", _params())
def test_tutorial_runs(path):
    runpy.run_path(str(path), run_name="__main__")
