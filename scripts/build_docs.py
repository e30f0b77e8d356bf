"""Static documentation + example-gallery builder.

The reference ships a sphinx + sphinx-gallery doc pipeline
(``/root/reference/doc/source/conf.py``, ``examples/*/GALLERY_HEADER.rst``)
that renders the user guide and executes/galleries the example scripts.
This is the TPU repo's equivalent on the in-image ``markdown`` +
``pygments`` packages (sphinx is not available in this environment):

- every ``doc/**/*.md`` page renders to ``doc/_build/html/**/*.html``
  with tables/fenced-code/TOC extensions, ``.md`` cross-links rewritten
  to ``.html``;
- every ``examples/<group>/*.py`` gets a gallery page (title/summary
  from the module docstring, source highlighted with pygments) plus a
  per-group index — the sphinx-gallery layout;
- one shared template with a sidebar nav (docs, theory, gallery groups);
- ``--check`` verifies every internal link resolves (CI gate; exits 1
  on dangling links).

Usage:
  python scripts/build_docs.py [--out doc/_build/html] [--check]
"""

import argparse
import ast
import html
import re
import shutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
DOC = ROOT / "doc"
EXAMPLES = ROOT / "examples"

CSS = """
body { margin: 0; font: 15px/1.55 system-ui, sans-serif; color: #1a1a2e; }
.wrap { display: flex; min-height: 100vh; }
nav { width: 250px; flex-shrink: 0; background: #f4f5f7;
      border-right: 1px solid #ddd; padding: 18px 14px; }
nav h3 { font-size: 12px; text-transform: uppercase; color: #777;
         margin: 16px 0 4px; }
nav a { display: block; color: #205; text-decoration: none;
        padding: 2px 6px; border-radius: 4px; font-size: 14px; }
nav a:hover { background: #e4e7ee; }
main { max-width: 860px; padding: 24px 40px; overflow-x: auto; }
main img { max-width: 100%; }
pre { background: #f6f8fa; padding: 10px 12px; border-radius: 6px;
      overflow-x: auto; font-size: 13px; }
code { background: #f2f3f5; padding: 1px 4px; border-radius: 3px;
       font-size: 0.92em; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 12px 0; }
th, td { border: 1px solid #ccc; padding: 5px 10px; text-align: left; }
th { background: #eef0f4; }
h1, h2, h3 { line-height: 1.25; }
a { color: #0b5394; }
.codehilite .k, .codehilite .kn { color: #8250df; }
.codehilite .s, .codehilite .s1, .codehilite .s2,
.codehilite .sd { color: #0a3069; }
.codehilite .c, .codehilite .c1 { color: #6e7781; font-style: italic; }
.codehilite .n, .codehilite .nn { color: #1a1a2e; }
.codehilite .nf, .codehilite .nc { color: #953800; }
"""

PAGE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — neuraloperator_tpu</title>
<link rel="stylesheet" href="{rel}style.css"></head>
<body><div class="wrap">
<nav>{nav}</nav>
<main>{body}</main>
</div></body></html>
"""

GALLERY_GROUPS = ("data", "data_gen", "layers", "models", "training")


def md_to_html(text: str) -> str:
    import markdown

    return markdown.markdown(
        text,
        extensions=["tables", "fenced_code", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )


def highlight_py(source: str) -> str:
    from pygments import highlight
    from pygments.formatters import HtmlFormatter
    from pygments.lexers import PythonLexer

    return highlight(source, PythonLexer(), HtmlFormatter(cssclass="codehilite"))


def rewrite_links(html_text: str, depth: int) -> str:
    """Rewrite relative .md hrefs to .html (anchors preserved)."""

    def sub(m):
        target = m.group(1)
        if target.startswith(("http:", "https:", "/")):
            return m.group(0)
        return 'href="%s"' % re.sub(r"\.md(#|$)", r".html\1", target)

    return re.sub(r'href="([^"]+\.md(?:#[^"]*)?)"', sub, html_text)


def doc_pages():
    return sorted(p for p in DOC.rglob("*.md") if "_build" not in p.parts)


def example_meta(path: Path):
    """(title, summary_md) from the module docstring."""
    try:
        doc = ast.get_docstring(ast.parse(path.read_text())) or ""
    except SyntaxError:
        doc = ""
    lines = doc.strip().splitlines() or [path.stem]
    title = lines[0].strip().rstrip(".")
    summary = "\n".join(lines[1:]).strip()
    return title, summary


def build_nav(rel: str) -> str:
    items = ['<h3>Docs</h3>']
    for p in doc_pages():
        sub = p.relative_to(DOC)
        if sub.parts[0] == "theory":
            continue
        name = "Home" if sub.stem == "index" else sub.stem.replace("_", " ")
        items.append(
            f'<a href="{rel}{sub.with_suffix(".html").as_posix()}">'
            f"{html.escape(name)}</a>"
        )
    items.append("<h3>Theory</h3>")
    for p in doc_pages():
        sub = p.relative_to(DOC)
        if sub.parts[0] != "theory":
            continue
        items.append(
            f'<a href="{rel}{sub.with_suffix(".html").as_posix()}">'
            f"{html.escape(sub.stem.replace('_', ' '))}</a>"
        )
    items.append("<h3>Gallery</h3>")
    for group in GALLERY_GROUPS:
        if (EXAMPLES / group).is_dir():
            items.append(
                f'<a href="{rel}gallery/{group}/index.html">{group}</a>'
            )
    return "\n".join(items)


def write_page(out: Path, title: str, body: str, depth: int):
    rel = "../" * depth
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(
        PAGE.format(title=html.escape(title), rel=rel,
                    nav=build_nav(rel), body=body)
    )


def build(out_dir: Path) -> list:
    if out_dir.exists():
        shutil.rmtree(out_dir)
    out_dir.mkdir(parents=True)
    (out_dir / "style.css").write_text(CSS)
    written = []

    # ---- doc pages ----------------------------------------------------
    for p in doc_pages():
        sub = p.relative_to(DOC).with_suffix(".html")
        depth = len(sub.parts) - 1
        body = rewrite_links(md_to_html(p.read_text()), depth)
        title = p.stem.replace("_", " ")
        m = re.search(r"^#\s+(.+)$", p.read_text(), re.M)
        if m:
            title = m.group(1).strip()
        write_page(out_dir / sub, title, body, depth)
        written.append(sub.as_posix())

    # ---- example gallery ----------------------------------------------
    for group in GALLERY_GROUPS:
        gdir = EXAMPLES / group
        if not gdir.is_dir():
            continue
        cards = []
        for script in sorted(gdir.glob("*.py")):
            title, summary = example_meta(script)
            page = Path("gallery") / group / f"{script.stem}.html"
            body = (
                f"<h1>{html.escape(title)}</h1>"
                + md_to_html(summary)
                + f"<p><code>examples/{group}/{script.name}</code></p>"
                + highlight_py(script.read_text())
            )
            write_page(out_dir / page, title, body, 2)
            written.append(page.as_posix())
            first = summary.splitlines()[0] if summary else ""
            cards.append(
                f'<li><a href="{script.stem}.html">{html.escape(title)}'
                f"</a> — {html.escape(first)}</li>"
            )
        index_body = (
            f"<h1>Examples: {group}</h1><ul>" + "\n".join(cards) + "</ul>"
        )
        idx = Path("gallery") / group / "index.html"
        write_page(out_dir / idx, f"Examples: {group}", index_body, 2)
        written.append(idx.as_posix())

    return written


def check_links(out_dir: Path) -> list:
    """Return dangling internal hrefs across the built site."""
    broken = []
    for page in out_dir.rglob("*.html"):
        for m in re.finditer(r'href="([^"#]+)(?:#[^"]*)?"', page.read_text()):
            target = m.group(1)
            if target.startswith(("http:", "https:", "mailto:")):
                continue
            resolved = (page.parent / target).resolve()
            if not resolved.exists():
                broken.append(f"{page.relative_to(out_dir)} -> {target}")
    return broken


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(DOC / "_build" / "html"))
    ap.add_argument("--check", action="store_true",
                    help="fail on dangling internal links")
    args = ap.parse_args()
    out_dir = Path(args.out)
    written = build(out_dir)
    print(f"built {len(written)} pages -> {out_dir}")
    if args.check:
        broken = check_links(out_dir)
        for b in broken:
            print(f"BROKEN: {b}", file=sys.stderr)
        if broken:
            sys.exit(1)
        print("link check: OK")


if __name__ == "__main__":
    main()
