"""
Self-contained static docs-site builder driven by ``mkdocs.yml``.

The reference gates its docs on ``mkdocs build --strict``
(``/root/reference/.github/workflows/ci.yml`` docs job;
``/root/reference/mkdocs.yml``).  mkdocs is not installable in every
environment this framework targets (hermetic TPU images with no package
egress), so this builder renders the same site from the same config
using only baked-in libraries (PyYAML + python-markdown + nbconvert):

    python scripts/build_docs_site.py -d /tmp/site          # build
    python scripts/build_docs_site.py -d /tmp/site --strict # CI gate

Strict mode fails on: nav entries pointing at missing files, relative
markdown links that resolve outside the docs tree or to missing files,
and invalid/unexecuted notebooks.  ``tests/test_docs_site.py`` runs this
unconditionally; ``mkdocs build`` still runs too when mkdocs is
importable (the mkdocs.yml stays fully mkdocs-compatible).
"""

from __future__ import annotations

import argparse
import html
import pathlib
import re
import shutil
import sys

import yaml

ROOT = pathlib.Path(__file__).resolve().parents[1]

PAGE_TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} - {site_name}</title>
<style>
:root {{ --fg: #1f2430; --muted: #5b6470; --accent: #00796b; --bg: #ffffff;
        --panel: #f5f7f8; --border: #e1e5e8; }}
body {{ margin: 0; font: 16px/1.6 system-ui, sans-serif; color: var(--fg);
       background: var(--bg); display: flex; min-height: 100vh; }}
nav {{ width: 270px; flex-shrink: 0; background: var(--panel);
      border-right: 1px solid var(--border); padding: 1.2rem; overflow-y: auto; }}
nav .site {{ font-weight: 700; color: var(--accent); margin-bottom: 1rem;
            font-size: 1.1rem; }}
nav ul {{ list-style: none; padding-left: 0.9rem; margin: 0.2rem 0; }}
nav > ul {{ padding-left: 0; }}
nav li {{ margin: 0.15rem 0; }}
nav .section {{ font-weight: 600; color: var(--muted); margin-top: 0.6rem; }}
nav a {{ color: var(--fg); text-decoration: none; }}
nav a:hover {{ color: var(--accent); }}
main {{ flex: 1; padding: 2rem 3rem; max-width: 54rem; }}
pre {{ background: var(--panel); border: 1px solid var(--border);
      border-radius: 6px; padding: 0.8rem; overflow-x: auto; font-size: 0.86em; }}
code {{ background: var(--panel); border-radius: 3px; padding: 0.1em 0.3em;
       font-size: 0.92em; }}
pre code {{ background: none; padding: 0; }}
table {{ border-collapse: collapse; }}
th, td {{ border: 1px solid var(--border); padding: 0.35rem 0.7rem; }}
h1, h2, h3 {{ line-height: 1.25; }}
.admonition {{ border-left: 4px solid var(--accent); background: var(--panel);
              padding: 0.6rem 1rem; border-radius: 0 6px 6px 0; margin: 1rem 0; }}
.nb-output {{ border-left: 3px solid var(--border); padding-left: 0.8rem;
             color: var(--muted); }}
</style>
</head>
<body>
<nav>
<div class="site"><a href="{root}index.html">{site_name}</a></div>
{nav_html}
</nav>
<main>
{content}
</main>
</body>
</html>
"""


class _PermissiveLoader(yaml.SafeLoader):
    """mkdocs configs may carry python-specific tags; parse them as
    opaque strings so the structure survives."""


_PermissiveLoader.add_multi_constructor(
    "", lambda loader, suffix, node: str(getattr(node, "value", ""))
)


def load_config(config_path: pathlib.Path) -> dict:
    return yaml.load(config_path.read_text(), Loader=_PermissiveLoader)


def nav_pages(nav) -> list:
    """Flatten the nav into (title, docs-relative path) in order."""
    pages = []

    def walk(entries):
        for entry in entries:
            if isinstance(entry, str):
                pages.append((pathlib.Path(entry).stem, entry))
            elif isinstance(entry, dict):
                for title, value in entry.items():
                    if isinstance(value, str):
                        pages.append((title, value))
                    else:
                        walk(value)

    walk(nav)
    return pages


def out_name(src: str) -> str:
    """Docs-relative source path -> site-relative HTML path."""
    p = pathlib.Path(src)
    return str(p.with_suffix(".html"))


def render_nav(nav, current: str, root_prefix: str) -> str:
    def links(entries):
        parts = ["<ul>"]
        for entry in entries:
            if isinstance(entry, str):
                entry = {pathlib.Path(entry).stem: entry}
            for title, value in entry.items():
                if isinstance(value, str):
                    href = root_prefix + out_name(value)
                    mark = ' style="font-weight:600"' if value == current else ""
                    parts.append(
                        f'<li><a href="{html.escape(href)}"{mark}>'
                        f"{html.escape(title)}</a></li>"
                    )
                else:
                    parts.append(
                        f'<li class="section">{html.escape(title)}{links(value)}</li>'
                    )
        parts.append("</ul>")
        return "".join(parts)

    return links(nav)


_MD_LINK = re.compile(r"\[([^\]]*)\]\(([^)#\s]+)(#[^)\s]*)?\)")


_MD_HEADING = re.compile(r"^(#{1,6})\s+(.+?)\s*#*\s*$", re.MULTILINE)


def _slugify(heading: str) -> str:
    """Anchor id for a heading — the toc extension's slugify (lowercase,
    strip punctuation, hyphens for spaces), enough for cross-page
    ``page.md#section`` fragment checking."""
    text = re.sub(r"[`*_\[\]()!]", "", heading)
    text = re.sub(r"[^\w\s-]", "", text.lower())
    return re.sub(r"[\s]+", "-", text.strip())


def page_anchors(path: pathlib.Path) -> set:
    """All heading anchors defined by a markdown page."""
    try:
        text = path.read_text()
    except Exception:
        return set()
    return {_slugify(m.group(2)) for m in _MD_HEADING.finditer(text)}


def check_links(src: str, text: str, docs_dir: pathlib.Path, errors: list):
    """Every relative link must resolve inside the docs tree, and every
    ``#fragment`` against a markdown page must name one of its headings
    (the parts of ``mkdocs build --strict`` link validation that matter)."""
    base = (docs_dir / src).parent
    for m in _MD_LINK.finditer(text):
        target = m.group(2)
        frag = (m.group(3) or "").lstrip("#")
        if re.match(r"^[a-z][a-z0-9+.-]*:", target) or target.startswith("/"):
            continue  # absolute URL / site-absolute
        resolved = (base / target).resolve()
        if not resolved.exists():
            errors.append(f"{src}: broken link -> {target}")
        elif docs_dir.resolve() not in resolved.parents and resolved != docs_dir.resolve():
            errors.append(f"{src}: link escapes docs tree -> {target}")
        elif frag and resolved.suffix == ".md":
            if frag not in page_anchors(resolved):
                errors.append(
                    f"{src}: broken anchor -> {target}#{frag}"
                )


def rewrite_md_links(text: str) -> str:
    """Point relative .md/.ipynb links at their rendered .html pages."""

    def sub(m):
        label, target, frag = m.group(1), m.group(2), m.group(3) or ""
        if re.match(r"^[a-z][a-z0-9+.-]*:", target) or target.startswith("/"):
            return m.group(0)
        if target.endswith((".md", ".ipynb")):
            target = str(pathlib.Path(target).with_suffix(".html"))
        return f"[{label}]({target}{frag})"

    return _MD_LINK.sub(sub, text)


def render_markdown(text: str) -> str:
    import markdown

    return markdown.markdown(
        text,
        extensions=["extra", "admonition", "toc", "sane_lists"],
    )


def render_notebook(path: pathlib.Path, strict: bool, errors: list) -> str:
    import nbformat

    nb = nbformat.read(path, as_version=4)
    try:
        nbformat.validate(nb)
    except Exception as exc:  # pragma: no cover - strict-mode diagnostics
        errors.append(f"{path.name}: invalid notebook ({exc})")
        return ""
    if strict:
        code = [c for c in nb.cells if c.cell_type == "code"]
        if code and not any(c.get("execution_count") for c in code):
            errors.append(
                f"{path.name}: ships unexecuted (run scripts/build_notebooks.py)"
            )
    parts = []
    for cell in nb.cells:
        if cell.cell_type == "markdown":
            parts.append(render_markdown(cell.source))
        elif cell.cell_type == "code":
            parts.append(f"<pre><code>{html.escape(cell.source)}</code></pre>")
            for out in cell.get("outputs", []):
                text = out.get("text") or (out.get("data", {}) or {}).get(
                    "text/plain", ""
                )
                if isinstance(text, list):
                    text = "".join(text)
                if text:
                    parts.append(
                        f'<pre class="nb-output">{html.escape(str(text))}</pre>'
                    )
    return "\n".join(parts)


def build(config_path: pathlib.Path, out_dir: pathlib.Path, strict: bool) -> list:
    config = load_config(config_path)
    docs_dir = (config_path.parent / config.get("docs_dir", "docs")).resolve()
    site_name = config.get("site_name", "docs")
    nav = config["nav"]
    errors = []

    out_dir.mkdir(parents=True, exist_ok=True)
    for title, src in nav_pages(nav):
        src_path = docs_dir / src
        if not src_path.exists():
            errors.append(f"nav references missing file: {src}")
            continue
        depth = len(pathlib.Path(src).parent.parts)
        root_prefix = "../" * depth
        if src.endswith(".ipynb"):
            content = render_notebook(src_path, strict, errors)
        else:
            text = src_path.read_text()
            check_links(src, text, docs_dir, errors)
            content = render_markdown(rewrite_md_links(text))
        page = PAGE_TEMPLATE.format(
            title=html.escape(title),
            site_name=html.escape(site_name),
            nav_html=render_nav(nav, src, root_prefix),
            content=content,
            root=root_prefix,
        )
        dest = out_dir / out_name(src)
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_text(page)

    # static assets referenced by pages (images etc.)
    for asset_dir in ("assets", "img"):
        src_assets = docs_dir / asset_dir
        if src_assets.is_dir():
            shutil.copytree(src_assets, out_dir / asset_dir, dirs_exist_ok=True)

    if strict:
        # mkdocs --strict errors on pages that exist in the docs tree but
        # are absent from the nav — orphans silently rot
        in_nav = {src for _, src in nav_pages(nav)}
        for page in sorted(docs_dir.rglob("*.md")) + sorted(
            docs_dir.rglob("*.ipynb")
        ):
            if ".ipynb_checkpoints" in page.parts:
                continue
            rel = str(page.relative_to(docs_dir))
            if rel not in in_nav:
                errors.append(f"page not in nav: {rel}")
    return errors


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[1])
    parser.add_argument("-d", "--site-dir", default="site")
    parser.add_argument("-f", "--config-file", default=str(ROOT / "mkdocs.yml"))
    parser.add_argument("--strict", action="store_true")
    args = parser.parse_args(argv)

    errors = build(
        pathlib.Path(args.config_file), pathlib.Path(args.site_dir), args.strict
    )
    for err in errors:
        print(f"ERROR: {err}", file=sys.stderr)
    if errors and args.strict:
        return 1
    n = len(list(pathlib.Path(args.site_dir).rglob("*.html")))
    print(f"built {n} pages into {args.site_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
