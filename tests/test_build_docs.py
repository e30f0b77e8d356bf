"""scripts/build_docs.py: the doc + gallery pipeline builds and links.

TPU-repo counterpart of the reference's sphinx/sphinx-gallery doc build
(``/root/reference/doc/source/conf.py``), on the in-image markdown +
pygments packages. Guards: every doc page and example renders, internal
links resolve, and .md cross-links are rewritten to .html.
"""

import importlib.util
from pathlib import Path

import pytest

pytest.importorskip("markdown")

SCRIPT = Path(__file__).resolve().parents[1] / "scripts/build_docs.py"


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    spec = importlib.util.spec_from_file_location("build_docs", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path_factory.mktemp("docs") / "html"
    written = mod.build(out)
    return mod, out, written


def test_all_doc_pages_and_galleries_render(built):
    mod, out, written = built
    n_md = len(mod.doc_pages())
    n_examples = sum(
        len(list((mod.EXAMPLES / g).glob("*.py")))
        for g in mod.GALLERY_GROUPS
        if (mod.EXAMPLES / g).is_dir()
    )
    # one page per md file + per example + one index per gallery group
    assert len(written) >= n_md + n_examples
    assert (out / "index.html").exists()
    assert (out / "style.css").exists()
    assert (out / "gallery/models/index.html").exists()


def test_no_dangling_internal_links(built):
    mod, out, _ = built
    assert mod.check_links(out) == []


def test_md_links_rewritten_to_html(built):
    mod, out, _ = built
    index = (out / "index.html").read_text()
    assert 'href="install.html"' in index
    assert ".md\"" not in index


def test_example_pages_carry_title_and_source(built):
    mod, out, _ = built
    page = (out / "gallery/models/plot_FNO_darcy.html").read_text()
    assert "Training an FNO on Darcy flow" in page
    assert "codehilite" in page  # highlighted source present
