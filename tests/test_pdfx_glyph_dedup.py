"""Overlapping-duplicate glyph sanitation in the PDF interpreter.

docling-parse's cell sanitation drops a glyph re-drawn on top of the
previous identical one; this shows up on the reference RTL corpus as
kashida-elongation runs where a large positive TJ kern retreats the pen
(~80% of the stroke width) before re-drawing the same stroke — and in
LTR PDFs as fake-bold double strikes. engine/pdfx drops the duplicate
when the pen moved less than 40% of the glyph's own advance; genuine
repeated letters ('ll', 'oo') kerned normally must always survive.
"""

from __future__ import annotations

from docling_spark.engine.pdfx import extract_pdf


def _pdf(content: str) -> bytes:
    return (
        "%PDF-1.4\n"
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> endobj\n"
        "4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> "
        "endobj\n"
        f"5 0 obj << /Length {len(content)} >> stream\n"
        f"{content}endstream endobj\n"
        "trailer << /Root 1 0 R >>\n%%EOF\n"
    ).encode("latin-1")


def test_overlapping_duplicate_glyph_dropped() -> None:
    # 'B' advance is 667/1000 em; a +600 TJ kern retreats the pen 0.6 em,
    # so the second 'B' draws 0.067 em after the first began (<40% of its
    # advance) — a double strike, dropped
    text, _, _ = extract_pdf(
        _pdf("BT /F1 12 Tf 72 700 Td [(AB) 600 (BC)] TJ ET\n"))
    assert "ABC" in text
    assert "ABB" not in text


def test_normally_kerned_repeat_survives() -> None:
    # same glyph pair with ordinary (small) kerning: both kept
    text, _, _ = extract_pdf(
        _pdf("BT /F1 12 Tf 72 700 Td [(fu) 30 (ll) 30 (y)] TJ ET\n"))
    assert "fully" in text


def test_adjacent_tj_repeat_without_kern_survives() -> None:
    # repeated glyph at full advance (no kern at all): both kept
    text, _, _ = extract_pdf(
        _pdf("BT /F1 12 Tf 72 700 Td (success) Tj ET\n"))
    assert "success" in text


def test_scaled_text_matrix_repeat_survives() -> None:
    # a scaled Tm (0.2 scale, a common generator pattern) shrinks the
    # pen delta between glyphs by tm[0]; the dedup threshold must shrink
    # with it or every 'll'/'cc' pair would be dropped
    text, _, _ = extract_pdf(
        _pdf("BT /F1 12 Tf 0.2 0 0 0.2 72 700 Tm (success fully) Tj ET\n"))
    assert "success fully" in text


def test_scaled_text_matrix_double_strike_dropped() -> None:
    # the double-strike dedup must still fire under a scaled Tm
    text, _, _ = extract_pdf(
        _pdf("BT /F1 12 Tf 0.2 0 0 0.2 72 700 Tm [(AB) 600 (BC)] TJ ET\n"))
    assert "ABC" in text
    assert "ABB" not in text


def test_magnified_text_matrix_double_strike_dropped() -> None:
    # tm[0] > 1: without the |tm[0]| factor the gate would never fire
    text, _, _ = extract_pdf(
        _pdf("BT /F1 12 Tf 3 0 0 3 72 700 Tm [(AB) 600 (BC)] TJ ET\n"))
    assert "ABC" in text
    assert "ABB" not in text


class TestParserRobustness:
    """Regression tests for the malformed-bytes review findings: each
    adversarial-but-plausible byte pattern must degrade (or parse
    correctly), never silently corrupt unrelated text."""

    def test_odd_digit_cmap_token_does_not_blank_page(self):
        # a ToUnicode CMap with an odd-digit dst token: the spec pads
        # with a trailing zero; a raise here used to blank the page
        cmap = (
            "/CIDInit /ProcSet findresource begin\n"
            "begincmap\n"
            "1 begincodespacerange <00> <FF> endcodespacerange\n"
            "2 beginbfchar <41> <004> <42> <0042> endbfchar\n"
            "endcmap\n"
        )
        content = "BT /F1 12 Tf 72 700 Td (AB) Tj ET\n"
        pdf = (
            "%PDF-1.4\n"
            "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> "
            "endobj\n"
            "4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            "/ToUnicode 6 0 R >> endobj\n"
            f"5 0 obj << /Length {len(content)} >> stream\n"
            f"{content}endstream endobj\n"
            f"6 0 obj << /Length {len(cmap)} >> stream\n"
            f"{cmap}endstream endobj\n"
            "trailer << /Root 1 0 R >>\n%%EOF\n"
        ).encode("latin-1")
        text, _, _ = extract_pdf(pdf)
        # 'B' maps via the well-formed pair; the page is not blanked
        assert "B" in text

    def test_ei_bytes_inside_inline_image_data(self):
        # inline image whose binary data contains 'EI' mid-stream: the
        # interpreter must skip to the whitespace-delimited EI, keeping
        # the text that follows
        content = (
            "BT /F1 12 Tf 72 700 Td (before) Tj ET\n"
            "BI /W 2 /H 2 /BPC 8 /CS /G ID xxEIxx(junk Tj \n"
            "EI\n"
            "BT /F1 12 Tf 72 650 Td (after) Tj ET\n"
        )
        pdf = (
            "%PDF-1.4\n"
            "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >> "
            "endobj\n"
            "4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            ">> endobj\n"
            f"5 0 obj << /Length {len(content)} >> stream\n"
            f"{content}endstream endobj\n"
            "trailer << /Root 1 0 R >>\n%%EOF\n"
        ).encode("latin-1")
        text, _, _ = extract_pdf(pdf)
        assert "before" in text and "after" in text
        assert "junk" not in text

    def test_explicit_zero_width_glyph_no_phantom_advance(self):
        from docling_spark.engine.pdfx import PdfDocument, load_fonts

        pdf = (
            "%PDF-1.4\n"
            "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            "3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            "/Resources << /Font << /F1 4 0 R >> >> >> endobj\n"
            "4 0 obj << /Type /Font /Subtype /Type1 /BaseFont /F "
            "/FirstChar 65 /Widths [0 500] >> endobj\n"
            "trailer << /Root 1 0 R >>\n%%EOF\n"
        ).encode("latin-1")
        doc = PdfDocument(pdf)
        fonts = load_fonts(doc, doc.pages()[0])
        f = fonts["F1"]
        assert f.advance(65) == 0.0   # explicit zero stays zero
        assert f.advance(66) == 0.5   # 500/1000
        assert f.advance(99) == f.default_w  # out of range -> default
