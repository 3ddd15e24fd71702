"""AsciiDoc engine parity against the reference's groundtruth corpus
(tests/data/asciidoc/{sources,groundtruth}) — exact md equality for every
fixture, plus routing and containment."""

import pathlib

import pytest

from docling_spark.engine.asciidocx import extract_asciidoc
from docling_spark.engine.extract import detect_format, extract_payload

SRC = pathlib.Path("/root/reference/tests/data/asciidoc/sources")
GT = pathlib.Path("/root/reference/tests/data/asciidoc/groundtruth")

FIXTURES = sorted(SRC.glob("*.asciidoc")) if SRC.exists() else []


@pytest.mark.parametrize("src", FIXTURES, ids=[f.name for f in FIXTURES])
def test_reference_groundtruth_md(src):
    text, _items, _m = extract_asciidoc(src.read_text())
    assert text.strip() == (GT / (src.name + ".md")).read_text().strip()


def test_item_tree_shape():
    text, items, m = extract_asciidoc(
        "= Title\n\nabstract text\n\n== Section A\n\n* one\n* two\n\n"
        "|H1|H2|\n|a|b|\n"
    )
    labels = [it["label"] for it in items]
    assert labels[:3] == ["unspecified", "title", "text"]
    assert "section_header" in labels and "table" in labels
    assert labels.count("list_item") == 2
    for it in items[1:]:
        assert 0 <= it["parent_idx"] < it["item_idx"]
    assert m["n_items"] == len(items) - 1


def test_routing():
    assert detect_format("= T\n\n== S\n\nbody") == "asciidoc"
    assert detect_format("plain words here") == "plain"
    # '=' title alone without sections is not enough to sniff
    assert detect_format("= just a line") == "plain"
    r = extract_payload("= T\n\n== S\n\nbody", "adoc")
    assert r["format"] == "asciidoc" and r["status"] == "success"
    assert r["extracted_text"] == "# T\n\n## S\n\nbody"


def test_md_escaping():
    text, _items, _m = extract_asciidoc("= A_B\n\n== S <x> & y\n\nt_t\n")
    assert text == "# A\\_B\n\n## S &lt;x&gt; &amp; y\n\nt\\_t"
