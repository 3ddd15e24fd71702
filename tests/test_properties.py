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


@settings(max_examples=200, deadline=None)
@given(text=payload_text,
       tool=st.sampled_from(["doclang", "dclx", "mets_gbs", "docx",
                             "doc", "xls", "ppt", "xlt", "pot"]))
def test_new_format_hints_total(text, tool):
    """Round-2 engines (incl. the native legacy Office binaries): any
    payload under these hints yields a contained result row, never an
    exception."""
    res = extract_payload(text, tool)
    assert res["status"] in _STATUSES
    if res["status"] == "failure":
        assert res["errors"]


@settings(max_examples=200, deadline=None)
@given(xml=st.text(alphabet=st.characters(min_codepoint=32,
                                          max_codepoint=126),
                   max_size=500))
def test_doclang_reader_total(xml):
    from docling_spark.engine.doclangx import DocLangError, extract_doclang

    try:
        text, items, metrics = extract_doclang("<doclang>" + xml
                                               + "</doclang>")
    except DocLangError:
        return
    assert isinstance(text, str)
    for i, it in enumerate(items):
        assert it["item_idx"] == i


@settings(max_examples=150, deadline=None)
@given(t=st.text(alphabet=st.characters(min_codepoint=32,
                                        blacklist_characters="\x7f",
                                        blacklist_categories=("Cs",)),
                 max_size=120))
def test_omml_run_total(t):
    """Any run text converts without raising and collapse is stable."""
    import xml.etree.ElementTree as ET

    from docling_spark.engine.ommlx import M, omml_to_latex
    from xml.sax.saxutils import escape

    xml = (f'<m:oMath xmlns:m="{M[1:-1]}"><m:r><m:t>{escape(t)}</m:t>'
           "</m:r></m:oMath>")
    out = omml_to_latex(ET.fromstring(xml))
    assert isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=512),
       st.binary(min_size=1, max_size=32))
def test_rc4_is_an_involution(data: bytes, key: bytes) -> None:
    from docling_spark.engine.pdfcrypto import rc4

    assert rc4(key, rc4(key, data)) == data


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_probe_media_total_on_arbitrary_bytes(data: bytes) -> None:
    """The audio prober never raises and always returns the full schema,
    whatever bytes arrive (failure containment in the media route)."""
    from docling_spark.engine.audiox import probe_media

    m = probe_media(data)
    assert set(m) == {"container", "codec", "duration_s", "sample_rate",
                      "channels", "bits", "n_frames"}
    if m["duration_s"] is not None:
        assert m["duration_s"] >= 0


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.text(alphabet="ابتثجحخدcélm01 ", min_size=1, max_size=3),
    min_size=1, max_size=30,
))
def test_fix_rtl_preserves_characters(glyphs: list[str]) -> None:
    """Bidi reordering is a permutation plus separator restoration: no
    non-space character appears or disappears, and the only additions
    are single spaces at RTL↔LTR script seams (the r5 inter-word space
    restoration — see pdfx._SCRIPT_SEAM)."""
    from collections import Counter

    from docling_spark.engine.pdfx import _fix_rtl

    out = _fix_rtl(list(glyphs))
    # paired brackets may mirror; canonicalize both sides to the opener
    canon = str.maketrans(")]}>", "([{<")
    got = Counter(out.translate(canon))
    want = Counter("".join(glyphs).translate(canon))
    added_spaces = got.pop(" ", 0) - want.pop(" ", 0)
    assert got == want          # non-space multiset is a permutation
    assert added_spaces >= 0    # spaces are only ever ADDED (at seams)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_pdf_parser_total_on_arbitrary_bytes(data: bytes) -> None:
    """Arbitrary bytes with a PDF magic prefix either parse or raise the
    typed PdfError — nothing else escapes."""
    from docling_spark.engine.pdfx import PdfError, extract_pdf

    try:
        text, items, metrics = extract_pdf(b"%PDF-1.4\n" + data)
        assert isinstance(text, str)
    except PdfError:
        pass


@settings(max_examples=200, deadline=None)
@given(text=payload_text,
       tool=st.sampled_from(["glm", "doctags", "yaml"]))
def test_session_format_hints_total(text, tool):
    """The GLM / DocTags / YAML scan formats: any payload under these
    hints yields a contained result row, never an exception."""
    res = extract_payload(text, tool)
    assert res["status"] in _STATUSES
    if res["status"] == "failure":
        assert res["errors"]


@settings(max_examples=150, deadline=None)
@given(text=st.text(alphabet=st.characters(min_codepoint=9,
                                           max_codepoint=126),
                    max_size=2000))
def test_doctags_parser_total_on_tag_soup(text):
    """Arbitrary angle-bracket soup wrapped in a doctag block parses to
    a well-formed item table (no recursion, no index errors)."""
    from docling_spark.engine.doctagsx import extract_doctags

    md, items, metrics = extract_doctags("<doctag>" + text + "</doctag>")
    assert isinstance(md, str)
    assert metrics["n_items"] == len(items) - 1
    for it in items[1:]:
        assert 0 <= it["parent_idx"] < it["item_idx"]
