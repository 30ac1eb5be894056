"""
Build executed Jupyter notebooks from the tutorial scripts.

The reference ships its tutorials as mkdocs-jupyter notebooks
(``docs/notebooks/*.py`` executed at docs-build time); here the tutorials
are runnable scripts under ``docs/tutorials/`` and this script converts a
curated subset into executed ``.ipynb`` files under ``docs/notebooks/``:

    python scripts/build_notebooks.py            # build + execute
    python scripts/build_notebooks.py --no-exec  # structure only (fast)

Conversion rules: the module docstring becomes the title markdown cell;
``# ---- ... ----`` comment banners become markdown cells; the code
between them becomes code cells.  The ``sys.path`` bootstrap block in each
tutorial is replaced by a notebook-appropriate one (repo root relative to
the notebook's directory).
"""

from __future__ import annotations

import argparse
import pathlib
import re
import sys

import nbformat

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT_DIR = ROOT / "docs" / "notebooks"

#: every tutorial ships as an executed notebook (reference parity:
#: /root/reference/docs/notebooks/ renders all tutorial sources)
NOTEBOOKS = [
    "01_coupled_model.py",
    "02_spatial_grids.py",
    "03_variable_schema.py",
    "04_state_serialisation.py",
    "05_debugging_inspection.py",
    "06_scenario_pipeline.py",
    "07_calibration.py",
    "08_units.py",
    "09_python_components.py",
    "10_ensembles_and_sharding.py",
    "11_magicc_coupled.py",
    "12_beyond_magicc7.py",
]

SETUP_CELL = """\
# Notebook setup: run from a source checkout on CPU.
import os, pathlib, sys

sys.path.insert(0, str(pathlib.Path.cwd().resolve().parents[1]))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)"""

_BOOTSTRAP = re.compile(
    r"# Allow running from a source checkout.*?sys\.path\.insert\([^\n]*\)\n",
    re.DOTALL,
)
_BANNER = re.compile(
    r"# -{10,}\n((?:#[^\n]*\n)+?)# -{10,}\n",
)


def _comment_to_markdown(block: str) -> str:
    lines = []
    for line in block.splitlines():
        line = line.lstrip("#")
        lines.append(line[1:] if line.startswith(" ") else line)
    return "\n".join(lines).strip()


def convert(path: pathlib.Path) -> nbformat.NotebookNode:
    source = path.read_text()

    # module docstring -> title cell
    m = re.match(r'"""(.*?)"""\n', source, re.DOTALL)
    title_md = ""
    if m:
        doc = m.group(1).strip()
        first, _, rest = doc.partition("\n")
        title_md = f"# {first.strip()}\n\n{rest.strip()}"
        source = source[m.end():]

    source = _BOOTSTRAP.sub("", source)

    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    if title_md:
        nb.cells.append(nbformat.v4.new_markdown_cell(title_md))
    nb.cells.append(nbformat.v4.new_code_cell(SETUP_CELL))

    pos = 0
    pending_code = ""

    def flush_code(chunk: str):
        chunk = chunk.strip("\n")
        if chunk:
            nb.cells.append(nbformat.v4.new_code_cell(chunk))

    for m in _BANNER.finditer(source):
        flush_code(pending_code + source[pos:m.start()])
        pending_code = ""
        nb.cells.append(
            nbformat.v4.new_markdown_cell(_comment_to_markdown(m.group(1)))
        )
        pos = m.end()
    flush_code(source[pos:])
    return nb


def execute(nb, cwd: pathlib.Path):
    from nbclient import NotebookClient

    client = NotebookClient(
        nb, timeout=900, kernel_name="python3", resources={"metadata": {"path": str(cwd)}}
    )
    client.execute()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-exec", action="store_true")
    args = parser.parse_args(argv)

    OUT_DIR.mkdir(exist_ok=True)
    for name in NOTEBOOKS:
        src = ROOT / "docs" / "tutorials" / name
        nb = convert(src)
        if not args.no_exec:
            print(f"executing {name} ...", flush=True)
            execute(nb, OUT_DIR)
        out = OUT_DIR / (src.stem + ".ipynb")
        nbformat.write(nb, out)
        print(f"wrote {out.relative_to(ROOT)} ({len(nb.cells)} cells)")


if __name__ == "__main__":
    main()
