"""PDF /Annots hyperlink extraction + max-coverage attachment.

The reference reads hyperlink rects from docling-parse's SegmentedPage and
attaches them to assembled elements by summed spatial coverage per URI with
a 0.5 threshold (docling/models/stages/page_assemble/
page_assemble_model.py:60-110). Here: a synthesized link-PDF round-trips
through engine/pdfx.pdf_hyperlinks, and the relational twin of the
attachment rule (operators/spatial.hyperlink_attach) is pinned on
hand-computed coverages: multi-rect summing, the 0.5 threshold, and the
deterministic tie-break.
"""

from __future__ import annotations

from docling_spark.engine.pdfx import pdf_hyperlinks, pdf_line_cells
from docling_spark.operators.spatial import hyperlink_attach


def _link_pdf() -> bytes:
    content = (
        "BT /F1 11 Tf 72 680 Td (click here) Tj ET\n"
        "BT /F1 11 Tf 72 600 Td (plain text) Tj ET\n"
    )
    return (
        "%PDF-1.4\n"
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 4 0 R >> >> "
        "/Annots [6 0 R 7 0 R 8 0 R 9 0 R] /Contents 5 0 R >> endobj\n"
        "4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> "
        "endobj\n"
        f"5 0 obj << /Length {len(content)} >> stream\n"
        f"{content}endstream endobj\n"
        # two rects, one URI, tiling the first line (corner order of the
        # second intentionally flipped — the spec allows any order)
        "6 0 obj << /Type /Annot /Subtype /Link /Rect [0 670 120 700] "
        "/A << /S /URI /URI (https://a.example/) >> >> endobj\n"
        "7 0 obj << /Type /Annot /Subtype /Link /Rect [120 700 612 670] "
        "/A << /S /URI /URI (https://a.example/) >> >> endobj\n"
        # a GoTo action must NOT surface as a hyperlink
        "8 0 obj << /Type /Annot /Subtype /Link /Rect [0 600 612 630] "
        "/A << /S /GoTo /D [3 0 R /Fit] >> >> endobj\n"
        # a non-Link annot must be ignored
        "9 0 obj << /Type /Annot /Subtype /Square /Rect [0 0 50 50] "
        ">> endobj\n"
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    ).encode("latin-1")


def test_pdf_hyperlinks_roundtrip() -> None:
    links = pdf_hyperlinks(_link_pdf())
    assert [lk["uri"] for lk in links] == ["https://a.example/"] * 2
    # top-left origin flip: bl y [670, 700] → tl [92, 122]; the flipped
    # corner order of rect 7 normalizes to the same band
    for lk in links:
        assert lk["page_no"] == 1
        assert (lk["t"], lk["b"]) == (92.0, 122.0)
    assert (links[0]["l"], links[0]["r"]) == (0.0, 120.0)
    assert (links[1]["l"], links[1]["r"]) == (120.0, 612.0)


def test_pdf_line_cells_inside_link_band() -> None:
    cells, _ = pdf_line_cells(_link_pdf())
    first = [c for c in cells if "click" in c["text"]]
    assert len(first) == 1
    l, t, r, b = first[0]["bbox"]
    assert 92.0 <= t and b <= 122.0  # fully inside the link band


def test_hyperlink_attach_sum_threshold_tiebreak(spark) -> None:
    items = spark.createDataFrame(
        [
            # item 0: tiled by uri_a's two rects (0.4 + 0.6 = 1.0)
            (1, 1, 0, 0.0, 100.0, 100.0, 110.0),
            # item 1: covered 0.4 by uri_b only — below threshold
            (1, 1, 1, 0.0, 200.0, 100.0, 210.0),
            # item 2: covered 1.0 by BOTH uri_c and uri_a → lexicographic
            # smaller URI wins the tie
            (1, 1, 2, 0.0, 300.0, 100.0, 310.0),
            # other doc, same page-local geometry: must not cross-match
            (2, 1, 0, 0.0, 100.0, 100.0, 110.0),
        ],
        "doc_id long, page int, item_id int, l double, t double, "
        "r double, b double",
    )
    links = spark.createDataFrame(
        [
            (1, 1, "https://a/", 0.0, 100.0, 40.0, 110.0),
            (1, 1, "https://a/", 40.0, 100.0, 100.0, 110.0),
            (1, 1, "https://b/", 0.0, 200.0, 40.0, 210.0),
            (1, 1, "https://c/", 0.0, 300.0, 100.0, 310.0),
            (1, 1, "https://a/", 0.0, 300.0, 100.0, 310.0),
        ],
        "doc_id long, page int, uri string, l double, t double, "
        "r double, b double",
    )
    got = {
        (r.doc_id, r.item_id): (r.uri, r.coverage)
        for r in hyperlink_attach(items, links, min_coverage=0.5).collect()
    }
    assert got == {
        (1, 0): ("https://a/", 1.0),
        (1, 2): ("https://a/", 1.0),
    }


def test_end_to_end_attach_on_real_pdf(spark) -> None:
    payload = _link_pdf()
    cells, _ = pdf_line_cells(payload)
    links = pdf_hyperlinks(payload)
    items_df = spark.createDataFrame(
        [(1, int(c["page_no"]), k, *map(float, c["bbox"]))
         for k, c in enumerate(cells)],
        "doc_id long, page int, item_id int, l double, t double, "
        "r double, b double",
    )
    links_df = spark.createDataFrame(
        [(1, lk["page_no"], lk["uri"], lk["l"], lk["t"], lk["r"], lk["b"])
         for lk in links],
        "doc_id long, page int, uri string, l double, t double, "
        "r double, b double",
    )
    out = hyperlink_attach(items_df, links_df).collect()
    assert len(out) == 1
    row = out[0]
    assert row.uri == "https://a.example/"
    assert row.coverage == 1.0
    assert "click" in cells[row.item_id]["text"]
