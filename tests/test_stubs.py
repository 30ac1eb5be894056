"""Type stubs stay in sync with the live compat surface.

The reference ships .pyi stubs for its native extension validated by
stubtest; here the stubs are generated (scripts/generate_stubs.py) and
this test pins the name-level contract: every public name of each
rscm._lib module appears in its stub, and every stub parses.
"""

import ast
import importlib
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]

MODULES = {
    "rscm._lib.core": "rscm/_lib/core/__init__.pyi",
    "rscm._lib.core.state": "rscm/_lib/core/state.pyi",
    "rscm._lib.core.spatial": "rscm/_lib/core/spatial.pyi",
    "rscm._lib.two_layer": "rscm/_lib/two_layer.pyi",
    "rscm._lib.components": "rscm/_lib/components.pyi",
    "rscm._lib.magicc": "rscm/_lib/magicc.pyi",
    "rscm._lib.calibrate": "rscm/_lib/calibrate.pyi",
}


@pytest.mark.parametrize("mod_name,stub_path", sorted(MODULES.items()))
def test_stub_covers_public_names(mod_name, stub_path):
    module = importlib.import_module(mod_name)
    tree = ast.parse((ROOT / stub_path).read_text())
    stub_names = {
        node.name
        for node in tree.body
        if isinstance(node, (ast.ClassDef, ast.FunctionDef))
    } | {
        t.id
        for node in tree.body
        if isinstance(node, ast.AnnAssign)
        for t in [node.target]
        if isinstance(t, ast.Name)
    }
    public = [
        n
        for n in (getattr(module, "__all__", None) or dir(module))
        if not n.startswith("_")
        and not isinstance(getattr(module, n, None), type(ast))  # skip submodules
    ]
    missing = [n for n in public if n not in stub_names]
    assert not missing, f"{stub_path} missing {missing} (re-run scripts/generate_stubs.py)"
