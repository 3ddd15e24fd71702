"""Pin the DOCX engine against the reference's own docx groundtruth corpus
(tests/data/docx/{sources,groundtruth}) — exact text equality.

Exclusions (documented in engine/docxx.py):
- textbox / drawingml: floating-shape anchoring, DrawingML text-body
  ordering, and embedded chart parts
"""

from __future__ import annotations

import pathlib

import pytest

from docling_spark.engine.docxx import extract_docx

REF = pathlib.Path("/root/reference/tests/data/docx")

EXPECT_MATCH = [
    "Strict", "Transitional",
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
