"""Docs site integrity: mkdocs.yml nav, notebooks, changelog fragments.

``mkdocs build`` itself runs when mkdocs is importable (it is not baked
into every environment); the structural contract — every nav entry exists,
every shipped notebook is valid and pre-executed, changelog fragments
follow the naming convention — is validated unconditionally.
"""

import pathlib
import re

import pytest
import yaml

ROOT = pathlib.Path(__file__).resolve().parents[1]


class _PermissiveLoader(yaml.SafeLoader):
    """mkdocs configs may use python-specific tags; treat unknown tags as
    opaque strings so the structure still parses."""


_PermissiveLoader.add_multi_constructor(
    "", lambda loader, suffix, node: str(getattr(node, "value", ""))
)


def _load_config():
    return yaml.load((ROOT / "mkdocs.yml").read_text(), Loader=_PermissiveLoader)


def _nav_paths(nav):
    for entry in nav:
        if isinstance(entry, str):
            yield entry
        elif isinstance(entry, dict):
            for value in entry.values():
                if isinstance(value, str):
                    yield value
                else:
                    yield from _nav_paths(value)


def test_nav_entries_exist():
    config = _load_config()
    docs_dir = ROOT / config.get("docs_dir", "docs")
    missing = [p for p in _nav_paths(config["nav"]) if not (docs_dir / p).exists()]
    assert not missing, f"mkdocs nav references missing files: {missing}"


def test_all_component_pages_in_nav():
    config = _load_config()
    nav_paths = set(_nav_paths(config["nav"]))
    pages = sorted(p.name for p in (ROOT / "docs" / "components").glob("*.md"))
    missing = [p for p in pages if f"components/{p}" not in nav_paths]
    assert not missing, f"component pages absent from nav: {missing}"


def test_notebooks_are_valid_and_executed():
    import nbformat

    notebooks = sorted((ROOT / "docs" / "notebooks").glob("*.ipynb"))
    # every tutorial source ships as an executed notebook (reference
    # parity: the reference renders all of its notebook sources into
    # its site) — the set must match docs/tutorials exactly
    sources = sorted(
        p.stem
        for p in (ROOT / "docs" / "tutorials").glob("*.py")
        if p.name[0].isdigit()
    )
    assert [p.stem for p in notebooks] == sources
    for path in notebooks:
        nb = nbformat.read(path, as_version=4)
        nbformat.validate(nb)
        code_cells = [c for c in nb.cells if c.cell_type == "code"]
        assert code_cells, path.name
        executed = [c for c in code_cells if c.get("execution_count")]
        assert executed, f"{path.name} ships unexecuted (run scripts/build_notebooks.py)"


def test_changelog_fragments_follow_convention():
    fragments = [
        p for p in (ROOT / "changelog").glob("*.md") if p.name != "README.md"
    ]
    assert fragments
    pattern = re.compile(r"^\d+\.(feature|improvement|fix|docs|trivial)\.md$")
    bad = [p.name for p in fragments if not pattern.match(p.name)]
    assert not bad, f"misnamed changelog fragments: {bad}"


def test_site_build_strict():
    """The docs site actually builds, strict, in every environment.

    ``scripts/build_docs_site.py`` renders the same mkdocs.yml nav with
    only baked-in libraries; mkdocs itself (when importable) is exercised
    by test_mkdocs_build below.
    """
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        subprocess.run(
            [
                sys.executable,
                str(ROOT / "scripts" / "build_docs_site.py"),
                "--strict",
                "-d",
                td,
            ],
            cwd=ROOT,
            check=True,
        )
        pages = list(pathlib.Path(td).rglob("*.html"))
        config = _load_config()
        assert len(pages) == len(set(_nav_paths(config["nav"])))
        index = (pathlib.Path(td) / "index.html").read_text()
        assert config["site_name"] in index


def test_strict_checks_catch_orphans_and_broken_anchors(tmp_path):
    """The self-contained builder enforces the ``mkdocs build --strict``
    failure modes: orphan pages, broken links, and broken #anchors."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "build_docs_site", ROOT / "scripts" / "build_docs_site.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    docs = tmp_path / "docs"
    docs.mkdir()
    (docs / "index.md").write_text(
        "# Home\n\n[ok](other.md#real-section)\n"
        "[bad anchor](other.md#no-such-heading)\n[dead](missing.md)\n"
    )
    (docs / "other.md").write_text("# Other\n\n## Real Section\ntext\n")
    (docs / "orphan.md").write_text("# Orphan\n")
    (tmp_path / "mkdocs.yml").write_text(
        "site_name: t\nnav:\n  - Home: index.md\n  - Other: other.md\n"
    )
    errors = mod.build(tmp_path / "mkdocs.yml", tmp_path / "site", strict=True)
    joined = "\n".join(errors)
    assert "broken anchor -> other.md#no-such-heading" in joined
    assert "broken link -> missing.md" in joined
    assert "page not in nav: orphan.md" in joined
    assert "real-section" not in joined  # the valid anchor passes


def test_mkdocs_build():
    mkdocs = pytest.importorskip("mkdocs")  # noqa: F841 — absence skips
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        subprocess.run(
            [sys.executable, "-m", "mkdocs", "build", "--strict", "-d", td],
            cwd=ROOT, check=True,
        )
