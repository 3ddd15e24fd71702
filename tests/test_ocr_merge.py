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
