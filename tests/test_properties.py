"""Property-based tests (hypothesis) over the pure-python engine kernels:
total robustness (extraction never raises, any input → a valid result
row), normalization idempotence, and span well-formedness."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from docling_spark.engine.extract import KNOWN_FORMATS, extract_payload
from docling_spark.functions.textnorm import normalize_plain

_STATUSES = {"success", "partial_success", "failure", "skipped"}

payload_text = st.text(max_size=2000)
tool_hint = st.sampled_from(["", "html", "md", "csv", "pdfish", "code",
                             "vtt", "email", "asciidoc", "junk-hint"])


@settings(max_examples=300, deadline=None)
@given(text=payload_text, tool=tool_hint)
def test_extract_total_and_well_formed(text, tool):
    res = extract_payload(text, tool)
    assert res["status"] in _STATUSES
    assert res["format"] in KNOWN_FORMATS
    assert isinstance(res["extracted_text"], str)
    assert isinstance(res["items"], list)
    # spans that claim to exist must index into the extracted text
    n = len(res["extracted_text"])
    for it in res["items"]:
        if it["span_start"] >= 0:
            assert 0 <= it["span_start"] <= it["span_end"] <= n
    # items form a tree rooted at 0 in depth-first index order
    for i, it in enumerate(res["items"]):
        assert it["item_idx"] == i
        if i > 0:
            assert 0 <= it["parent_idx"] < i
    # failures always carry a structured error
    if res["status"] in ("failure", "skipped"):
        assert res["errors"]


@settings(max_examples=300, deadline=None)
@given(text=st.text(max_size=500))
def test_normalize_plain_idempotent(text):
    once = normalize_plain(text)
    assert normalize_plain(once) == once
    assert " " not in once and "—" not in once


@settings(max_examples=150, deadline=None)
@given(
    lines=st.lists(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
                           max_size=40), max_size=8)
)
def test_sanitize_lines_total(lines):
    from docling_spark.functions.textnorm import sanitize_lines

    out = sanitize_lines(lines)
    assert isinstance(out, str)
    assert out == out.strip()


@settings(max_examples=200, deadline=None)
@given(text=st.text(max_size=1000))
def test_html_engine_total(text):
    from docling_spark.engine.htmlx import extract_html

    md, items = extract_html(text)
    assert isinstance(md, str)
    assert items[0]["label"] == "unspecified"


@settings(max_examples=200, deadline=None)
@given(text=st.text(max_size=800))
def test_asciidoc_engine_total(text):
    from docling_spark.engine.asciidocx import extract_asciidoc

    md, items, metrics = extract_asciidoc(text)
    assert isinstance(md, str)
    assert metrics["n_items"] == len(items) - 1
