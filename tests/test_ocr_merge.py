"""Tesseract TSV cell parse + OCR/PDF overlap merge (ocr_merge.py vs
tesseract_ocr_cli_model.py:195-217,360-389 and
base_ocr_model.py:274-340)."""

from __future__ import annotations

import pytest

from docling_spark.operators.ocr_merge import (
    OCR_FIRST,
    PDF_FIRST,
    merge_ocr_pdf_cells,
    ocr_score,
    tsv_ocr_cells,
)


def _parse(spark, tsv):
    df = spark.createDataFrame([(1, tsv)], "doc_id int, tsv string")
    return {r["cell_idx"]: (r["text"], r["conf"], r["l"], r["t"],
                            r["r"], r["b"])
            for r in tsv_ocr_cells(df).collect()}


HDR = ("level\tpage_num\tblock_num\tpar_num\tline_num\tword_num"
       "\tleft\ttop\twidth\theight\tconf\ttext")


def test_header_positions_respected_even_when_reordered(spark):
    # read_csv trusts the header row, not fixed offsets
    tsv = ("text\tconf\tleft\ttop\twidth\theight\n"
           "hello\t90\t10\t20\t30\t40")
    got = _parse(spark, tsv)
    assert got[0] == ("hello", 0.9, 10.0, 20.0, 40.0, 60.0)


def test_structural_and_blank_rows_dropped(spark):
    tsv = (HDR + "\n"
           "2\t1\t1\t1\t1\t0\t0\t0\t200\t30\t-1\t\n"      # block: empty text
           "5\t1\t1\t1\t1\t0\t5\t6\t70\t20\t91\tword\n"
           "5\t1\t1\t1\t1\t0\t5\t30\t70\t20\t40\t   ")    # whitespace text
    got = _parse(spark, tsv)
    assert list(got) == [0]
    assert got[0] == ("word", 0.91, 5.0, 6.0, 75.0, 26.0)


def test_missing_header_column_yields_null_not_error(spark):
    tsv = "left\ttop\twidth\theight\tconf\nx\t1\t2\t3\t4"  # no text column
    df = spark.createDataFrame([(1, tsv)], "doc_id int, tsv string")
    assert tsv_ocr_cells(df).count() == 0  # null text filtered, no crash


def _cells(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id int, text string, conf double, l double, t double, "
              "r double, b double")


def test_pdf_first_drops_overlapping_and_touching_ocr(spark):
    pdf = _cells(spark, [(1, "pdf", 1.0, 0.0, 0.0, 100.0, 20.0)])
    ocr = _cells(spark, [
        (1, "overlap", 0.9, 50.0, 10.0, 150.0, 30.0),
        (1, "touch", 0.8, 100.0, 0.0, 160.0, 20.0),  # shares l=100 edge
        (1, "free", 0.7, 200.0, 80.0, 260.0, 95.0),
    ])
    got = {(r["text"], r["from_ocr"])
           for r in merge_ocr_pdf_cells(ocr, pdf, PDF_FIRST).collect()}
    assert got == {("pdf", False), ("free", True)}


def test_ocr_first_keeps_all_ocr_and_filters_pdf(spark):
    pdf = _cells(spark, [(1, "pdf_hit", 1.0, 0.0, 0.0, 100.0, 20.0),
                         (1, "pdf_free", 1.0, 0.0, 200.0, 50.0, 220.0)])
    ocr = _cells(spark, [(1, "ocr", 0.9, 50.0, 10.0, 150.0, 30.0)])
    got = {(r["text"], r["from_ocr"])
           for r in merge_ocr_pdf_cells(ocr, pdf, OCR_FIRST).collect()}
    assert got == {("ocr", True), ("pdf_free", False)}


def test_merge_is_page_scoped(spark):
    # identical geometry on different docs must not interact
    pdf = _cells(spark, [(1, "pdf", 1.0, 0.0, 0.0, 100.0, 20.0)])
    ocr = _cells(spark, [(2, "ocr", 0.9, 50.0, 10.0, 150.0, 30.0)])
    assert merge_ocr_pdf_cells(ocr, pdf, PDF_FIRST).count() == 2


def test_unknown_priority_raises(spark):
    pdf = _cells(spark, [])
    with pytest.raises(ValueError):
        merge_ocr_pdf_cells(pdf, pdf, "both_first")


def test_ocr_score_means_only_ocr_cells(spark):
    pdf = _cells(spark, [(1, "pdf", 1.0, 0.0, 0.0, 10.0, 10.0)])
    ocr = _cells(spark, [(1, "a", 0.8, 20.0, 0.0, 30.0, 10.0),
                         (1, "b", 0.6, 40.0, 0.0, 50.0, 10.0)])
    merged = merge_ocr_pdf_cells(ocr, pdf, PDF_FIRST)
    row = ocr_score(merged).collect()[0]
    assert row["ocr_score"] == pytest.approx(0.7)


def test_merge_plan_is_not_cartesian(spark):
    pdf = _cells(spark, [(1, "pdf", 1.0, 0.0, 0.0, 10.0, 10.0)])
    ocr = _cells(spark, [(1, "a", 0.8, 20.0, 0.0, 30.0, 10.0)])
    plan = merge_ocr_pdf_cells(ocr, pdf, PDF_FIRST)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- OCR region selection + rect dedup (base_ocr_model.py:106-210) ---

from docling_spark.operators.ocr_merge import dedup_rects, ocr_regions  # noqa: E402


def _boxes(spark, rows, extra=""):
    return spark.createDataFrame(
        rows, f"doc_id int{extra}, l double, t double, r double, b double")


def test_ocr_regions_bitmap_or_no_pdf_rule(spark):
    clusters = spark.createDataFrame(
        [(1, 0, 0.0, 0.0, 100.0, 50.0),     # overlaps bitmap -> kept
         (1, 1, 200.0, 0.0, 300.0, 50.0),   # overlaps text only -> dropped
         (1, 2, 400.0, 0.0, 500.0, 50.0)],  # overlaps nothing -> kept
        "doc_id int, cluster_id int, l double, t double, r double, b double")
    bitmaps = _boxes(spark, [(1, 50.0, 10.0, 80.0, 40.0)])
    texts = _boxes(spark, [(1, 210.0, 10.0, 290.0, 30.0)])
    got = {r["cluster_id"]
           for r in ocr_regions(clusters, texts, bitmaps).collect()}
    assert got == {0, 2}


def test_ocr_regions_bitmap_overlap_beats_text_overlap(spark):
    # a cluster overlapping BOTH a text cell and a bitmap is kept
    # (base_ocr_model.py:141-143: non-text overlap wins)
    clusters = spark.createDataFrame(
        [(1, 0, 0.0, 0.0, 100.0, 50.0)],
        "doc_id int, cluster_id int, l double, t double, r double, b double")
    bitmaps = _boxes(spark, [(1, 10.0, 10.0, 20.0, 20.0)])
    texts = _boxes(spark, [(1, 30.0, 10.0, 60.0, 20.0)])
    assert ocr_regions(clusters, texts, bitmaps).count() == 1


def test_dedup_rects_merges_within_dilation_and_reports_coverage(spark):
    rects = _boxes(spark, [
        (1, 100.0, 100.0, 150.0, 130.0),
        (1, 160.0, 140.0, 200.0, 160.0),   # dilated boxes overlap r1's
        (1, 400.0, 100.0, 450.0, 120.0),   # isolated
    ])
    out = sorted(
        dedup_rects(rects, page_w=612.0, page_h=792.0,
                    dilation_size=20).collect(),
        key=lambda r: r["region_idx"])
    assert len(out) == 2
    assert (out[0]["l"], out[0]["t"], out[0]["r"], out[0]["b"]) == \
        (90.0, 90.0, 210.0, 170.0)
    assert (out[1]["l"], out[1]["t"], out[1]["r"], out[1]["b"]) == \
        (390.0, 90.0, 460.0, 130.0)
    # union area: (70*50 + 60*40 - 10*10) + 70*40 = 8600
    assert out[0]["coverage"] == pytest.approx(8600 / (612.0 * 792.0))


def test_dedup_rects_clips_to_page(spark):
    rects = _boxes(spark, [(1, 560.0, 100.0, 610.0, 120.0)])
    out = dedup_rects(rects, page_w=612.0, page_h=792.0,
                      dilation_size=20).collect()[0]
    assert (out["l"], out["r"]) == (550.0, 612.0)
    assert out["coverage"] == pytest.approx(62 * 40 / (612.0 * 792.0))


def test_dedup_rects_transitive_chain_merges(spark):
    # a-b overlap and b-c overlap but a-c don't: one component
    rects = _boxes(spark, [
        (1, 100.0, 100.0, 120.0, 110.0),
        (1, 130.0, 100.0, 150.0, 110.0),
        (1, 160.0, 100.0, 180.0, 110.0),
    ])
    out = dedup_rects(rects, page_w=612.0, page_h=792.0,
                      dilation_size=20).collect()
    assert len(out) == 1
    assert (out[0]["l"], out[0]["r"]) == (90.0, 190.0)


def test_tsv_crlf_line_endings_tolerated(spark):
    tsv = "text\tconf\tleft\ttop\twidth\theight\r\nhello\t90\t10\t20\t30\t40\r\n"
    df = spark.createDataFrame([(1, tsv)], "doc_id int, tsv string")
    got = tsv_ocr_cells(df).collect()
    assert len(got) == 1 and got[0]["r"] == 40.0


def test_short_data_line_nulls_fields_instead_of_raising(spark):
    # a truncated tesseract line (fewer fields than the header) must
    # degrade to null geometry, not an ANSI INVALID_ARRAY_INDEX error
    tsv = (HDR + "\n"
           "5\t1\t1\t1\t1\t0\t5\t6\t70\t20\t91\tword\n"
           "5\t1\t1")  # truncated: no text field at all
    df = spark.createDataFrame([(1, tsv)], "doc_id int, tsv string")
    got = tsv_ocr_cells(df).collect()
    assert [r["text"] for r in got] == ["word"]
