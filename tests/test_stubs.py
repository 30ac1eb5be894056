"""Type stubs stay in sync with the live compat surface.

The reference ships .pyi stubs for its native extension validated by
mypy.stubtest (its Makefile:37-39); here the stubs are generated
(scripts/generate_stubs.py), which enables a *stronger* signature-level
check: each .pyi must be byte-identical to what the generator emits from
the live modules.  The generator derives every entry from
``inspect.signature``/``getattr_static``, so any drift in a public
signature — parameter names, order, added/removed defaults,
static/class/property kind, attribute presence — changes the generated
text and fails the test with a diff.  A name-level test is kept for
faster, more targeted failure messages.
"""

import ast
import difflib
import importlib
import importlib.util
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        "generate_stubs", ROOT / "scripts" / "generate_stubs.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

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


@pytest.fixture(scope="module")
def stub_generator():
    return _load_generator()


@pytest.mark.parametrize("mod_name,stub_path", sorted(MODULES.items()))
def test_stub_signatures_match_live_surface(mod_name, stub_path, stub_generator):
    """Signature-level stubtest: the .pyi on disk must be exactly what the
    generator derives from the live module via inspect.signature."""
    module = importlib.import_module(mod_name)
    expected = stub_generator.stub_module(module)
    actual = (ROOT / stub_path).read_text()
    if actual != expected:
        diff = "\n".join(
            difflib.unified_diff(
                actual.splitlines(), expected.splitlines(),
                fromfile=f"{stub_path} (on disk)",
                tofile=f"{stub_path} (from live surface)",
                lineterm="", n=2,
            )
        )
        raise AssertionError(
            f"stub drift in {stub_path} — a public signature changed; "
            f"re-run scripts/generate_stubs.py:\n{diff}"
        )


def test_generator_covers_all_stub_modules(stub_generator):
    """Every stub file the repo ships is under generator (and test) control."""
    shipped = {
        str(p.relative_to(ROOT))
        for p in (ROOT / "rscm" / "_lib").rglob("*.pyi")
    }
    assert shipped == set(stub_generator.MODULES.values())
    assert set(MODULES) == set(stub_generator.MODULES)
