"""Pin the DOCX engine against the reference's own docx groundtruth corpus
(tests/data/docx/{sources,groundtruth}) — exact text equality.

textbox.docx is pinned as a SUPERSET: the reference's textbox pass
deduplicates containers by ``id()`` of transient lxml proxies
(msword_backend.py:719,770-773), which non-semantically drops four
textboxes in this file ('A report must be submitted…', 'Department of
Education:…', 'The Health Bureau will handle…', one 'No'). This engine
keeps them; the test asserts the output equals the groundtruth with
exactly those four blocks re-inserted.
"""

from __future__ import annotations

import pathlib

import pytest

from docling_spark.engine.docxx import extract_docx

REF = pathlib.Path("/root/reference/tests/data/docx")

EXPECT_MATCH = [
    "Strict", "Transitional", "drawingml",
    "docx_checkboxes", "docx_code_blocks", "docx_comments",
    "docx_external_image", "docx_grouped_images", "docx_list_blank_spacer",
    "docx_list_resumed_numbering", "docx_lists",
    "docx_page_header_footer_first_page", "docx_rich_cells",
    "docx_rich_tables_01",
    "docx_vml_images", "equations", "list_after_num_headers",
    "lorem_ipsum",
    "omml_frac_superscript", "omml_func_log",
    "omml_multi_equation_paragraph", "omml_text_escapes_in_math",
    "table_with_equations",
    "tablecell", "test_emf_docx", "unit_test_formatting",
    "unit_test_headers", "unit_test_headers_numbered",
    "word_image_anchors", "word_sample", "word_tables",
]

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)


@pytest.mark.parametrize("name", EXPECT_MATCH)
def test_reference_groundtruth_docx(name: str) -> None:
    src = (REF / "sources" / f"{name}.docx").read_bytes()
    gt = (REF / "groundtruth" / f"{name}.docx.md").read_text()
    text, items, metrics = extract_docx(src)
    assert text.strip() == gt.strip()
    for it in items[1:]:
        assert 0 <= it["parent_idx"] < it["item_idx"]


def test_rejects_non_zip() -> None:
    from docling_spark.engine.docxx import DocxError

    with pytest.raises(DocxError):
        extract_docx(b"this is not a zip")


def test_textbox_superset_of_groundtruth() -> None:
    """textbox.docx: groundtruth plus the four textboxes the reference's
    id()-reuse dedup drops (see module docstring)."""
    src = (REF / "sources" / "textbox.docx").read_bytes()
    gt = (REF / "groundtruth" / "textbox.docx.md").read_text().strip()
    text, items, metrics = extract_docx(src)
    got_blocks = text.strip().split("\n\n")
    gt_blocks = gt.split("\n\n")
    extras = [
        b for b in got_blocks
        if b.startswith((
            "- A report must be submitted within 24 hours",
            "Department of Education:",
            "The Health Bureau will handle",
        )) or b == "No"
    ]
    # all four dropped boxes present (the lone extra 'No' + three texts)
    assert len([b for b in extras if b != "No"]) == 3
    # and removing exactly those yields the groundtruth sequence
    remaining = list(got_blocks)
    for b in [
        "- A report must be submitted within 24 hours via the Ministry "
        "of Education’s Campus Safety and Disaster Prevention Information "
        "Network.\n- A report must also be submitted within 48 hours "
        "through Chiayi County’s School Suspected Infectious Disease "
        "Reporting System.",
        "Department of Education:\nCollaborate with the Health Bureau in "
        "conducting epidemiological investigations and assist Health "
        "Bureau personnel in implementing necessary epidemic prevention "
        "measures at all school levels.",
        "The Health Bureau will handle **reporting and specimen "
        "collection** .",
    ]:
        remaining.remove(b)
    # the LAST 'No' (the flowchart-bottom box) is the dropped duplicate
    assert remaining.count("No") == gt_blocks.count("No") + 1
    del remaining[len(remaining) - 1 - remaining[::-1].index("No")]
    assert remaining == gt_blocks
